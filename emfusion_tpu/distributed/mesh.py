"""Device-mesh sharding of the pipeline state.

TPU-native scaling design (no reference analogue — the reference is
single-GPU with per-object CUDA streams, SURVEY.md §2.4):

  * **Object axis** ("obj"): the batched object pool's leading K axis is
    sharded across devices — the distributed analogue of the reference's
    per-object stream map. Per-object tracking/raycast/fusion are
    independent, so XLA partitions the vmapped programs with zero
    communication; only the E-step normalization (a per-pixel sum over
    models, ``EMFusion.cpp:653-669``) induces an all-reduce over the
    object axis, riding ICI.
  * **Volume axis** ("z"): the background volume's Z (slowest) axis is
    sharded. Fusion and gradient computation are voxel-local (gradients
    need a one-plane halo which GSPMD materializes as a collective
    permute); trilinear sampling during tracking/raycast gathers across
    shards (GSPMD chooses all-gather or halo exchange).
  * The per-pixel Jacobian/residual rows of the camera GN system live
    replicated here; the pixel-sharded + ``psum``-reduced variant of the
    6x6 normal equations lives in ``shard_map``-based kernels (later
    milestone).

Everything uses ``jax.jit`` + ``NamedSharding`` annotations (GSPMD):
pick a mesh, annotate, let XLA insert collectives.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for a multi-host run.

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU fleets pass coordinator ("host:port"), num_processes and
    process_id (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). Returns True if distributed mode is active.

    Frame input fan-out across hosts rides DCN: every process runs the
    same program; host 0 reads frames and the arrays are sharded/
    replicated by GSPMD from the global mesh (jax.make_array_from_
    process_local_data for per-host inputs).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    except Exception:
        return False


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Build a 2-D (obj, z) mesh over the first ``n_devices`` devices.

    Factorization: z gets 2 if n is even (volume sharding), objects get
    the rest. Single device -> 1x1 mesh.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    nz = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    no = n_devices // nz
    dev_array = np.array(devices).reshape(no, nz)
    return Mesh(dev_array, ("obj", "z"))


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree matching a PipelineState."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    from emfusion_tpu.pipeline import ObjectPool, PipelineState
    objs = ObjectPool(
        tsdf=ns("obj", "z", None, None),
        weights=ns("obj", "z", None, None),
        # channel-first volumes: K, C, Z, Y, X — Z is dim 2
        grads=ns("obj", None, "z", None, None),
        fg_counts=ns("obj", None, "z", None, None),
        pose=ns(), voxel_size=ns(), truncdist=ns(),
        active=ns(), visible=ns(), object_id=ns(),
        assoc=ns("obj", None, None),
    )
    return PipelineState(
        bg_tsdf=ns("z", None, None),
        bg_weights=ns("z", None, None),
        bg_grads=ns(None, "z", None, None),
        bg_pose=ns(), bg_assoc=ns(), cam_pose=ns(),
        objs=objs,
    )


def shard_state(state, mesh: Mesh):
    """Place a PipelineState onto the mesh with the canonical shardings."""
    shardings = state_shardings(mesh, state)
    return jax.device_put(state, shardings)
