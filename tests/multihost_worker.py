"""Worker process for the 2-process jax.distributed test.

Usage: python multihost_worker.py <process_id> <coordinator_port>

Each of the 2 processes exposes 4 virtual CPU devices (8 global). The
worker initializes the distributed runtime via
``emfusion_tpu.distributed.mesh.initialize_multihost``, builds a global
1-D "px" mesh over all 8 devices, shards the camera-LM tracking points
over it (pixel-sharded Gauss-Newton: the (6,N)x(N,6) normal-equation
contraction becomes per-shard partial products + an all-reduce — the
multi-host analogue of ``reduceAb``, src/core/TSDF.cpp:375-389), runs
the jitted LM to convergence and checks the pose against the
single-process unsharded result computed locally.

Prints ``MULTIHOST OK <pid>`` on success.
"""

import os
import sys

# exactly 4 local virtual devices (drop any inherited device-count flag,
# e.g. from the pytest conftest of the parent process)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if not f.startswith("--xla_force_host_platform_device_count")]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import numpy as np


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from emfusion_tpu.distributed.mesh import initialize_multihost
    ok = initialize_multihost(f"localhost:{port}", 2, proc_id)
    assert ok, "initialize_multihost failed"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from emfusion_tpu.geometry import se3_exp, pose_inverse
    from emfusion_tpu.tracking import TrackConfig, track_volume

    # deterministic scene on every process
    res, voxel, radius, trunc = 48, 0.05, 0.5, 0.25
    idx = np.arange(res, dtype=np.float32) - (res - 1) / 2
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) * voxel
    tsdf = np.clip((r - radius) / trunc, -1, 1).astype(np.float32)
    weights = np.ones_like(tsdf)

    rng = np.random.RandomState(1)
    n = 4096
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = -np.abs(v[:, 2])
    p_obj = v * radius
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    T_oc = np.asarray(pose_inverse(jnp.asarray(gt)))
    pts = (p_obj @ T_oc[:3, :3].T + T_oc[:3, 3]).astype(np.float32).T
    xi = jnp.array([0.02, -0.03, 0.04, 0.02, -0.01, 0.015])
    init = np.asarray(se3_exp(xi)) @ gt
    assoc = np.ones(n, np.float32)
    cfg = TrackConfig(max_iter=40)

    # unsharded local reference
    pose_ref, _ = jax.jit(
        lambda ini: track_volume(jnp.asarray(tsdf), jnp.asarray(weights),
                                 voxel, jnp.asarray(pts),
                                 jnp.asarray(assoc), ini, cfg))(
                                     jnp.asarray(init))
    pose_ref = np.asarray(pose_ref)

    # pixel-sharded over the 8 global devices (both processes)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("px",))
    pts_sh = jax.device_put(pts, NamedSharding(mesh, P(None, "px")))
    asc_sh = jax.device_put(assoc, NamedSharding(mesh, P("px")))
    vol_sh = jax.device_put(tsdf, NamedSharding(mesh, P()))
    w_sh = jax.device_put(weights, NamedSharding(mesh, P()))

    step = jax.jit(lambda t, w, p_, a, ini: track_volume(
        t, w, voxel, p_, a, ini, cfg)[0])
    pose_sh = step(vol_sh, w_sh, pts_sh, asc_sh, jnp.asarray(init))
    assert pose_sh.is_fully_replicated
    pose_sh = np.asarray(pose_sh)

    err = np.abs(pose_sh - pose_ref).max()
    assert err < 1e-4, (err, pose_sh, pose_ref)
    # and it actually tracked toward ground truth (sphere-center error —
    # rotation about the center is gauge freedom on a sphere scene)
    c_est = np.asarray(pose_inverse(jnp.asarray(pose_sh)))[:3, 3]
    c_gt = np.asarray(pose_inverse(jnp.asarray(gt)))[:3, 3]
    c_init = np.asarray(pose_inverse(jnp.asarray(init)))[:3, 3]
    gt_err = np.linalg.norm(c_est - c_gt)
    init_err = np.linalg.norm(c_init - c_gt)
    assert gt_err < 0.5 * init_err, (gt_err, init_err)

    print(f"MULTIHOST OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
