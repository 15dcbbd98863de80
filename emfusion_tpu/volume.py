"""TSDF volume state as a JAX pytree.

TPU-native replacement for the reference's ``TSDF``/``ObjTSDF`` classes
(``include/EMFusion/core/TSDF.h``, ``ObjTSDF.h``): instead of GpuMat members
and CUDA streams, a volume is an immutable pytree of dense ``(Z, Y, X)``
arrays plus pose/voxel-size scalars, so it can be vmapped over a batched
object pool and sharded over a device mesh.

Object volumes keep the extra ``fg_counts`` channel pair (foreground /
background evidence counters, reference ``ObjTSDF.h:33-217``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TSDFVolume:
    """Dense TSDF volume.

    Attributes:
      tsdf: (Z, Y, X) truncated signed distance, in units of truncdist
        (range [-1, 1]).
      weights: (Z, Y, X) integration weights.
      grads: (3, Z, Y, X) forward-difference gradient of tsdf (voxel
        units), channel-first for TPU tiling.
      pose: (4, 4) volume-to-world transform (volume center at origin).
      voxel_size: scalar array — metric edge length of a voxel.
      truncdist: scalar array — metric truncation distance.
      fg_counts: optional (2, Z, Y, X) foreground/background counters
        (object volumes only).
    """

    tsdf: jnp.ndarray
    weights: jnp.ndarray
    grads: jnp.ndarray
    pose: jnp.ndarray
    voxel_size: jnp.ndarray
    truncdist: jnp.ndarray
    fg_counts: Optional[jnp.ndarray] = None

    @property
    def res_zyx(self) -> Tuple[int, int, int]:
        return self.tsdf.shape[-3:]

    @property
    def res_xyz(self) -> Tuple[int, int, int]:
        z, y, x = self.tsdf.shape[-3:]
        return (x, y, z)


def make_volume(res_xyz: Tuple[int, int, int], voxel_size: float,
                truncdist: float, pose: jnp.ndarray,
                with_fg: bool = False,
                dtype=jnp.float32) -> TSDFVolume:
    """Allocate a zeroed volume (reference ``TSDF::TSDF``/``reset``,
    ``src/core/TSDF.cpp:28-79``)."""
    X, Y, Z = res_xyz
    zeros = jnp.zeros((Z, Y, X), dtype=dtype)
    return TSDFVolume(
        tsdf=zeros,
        weights=zeros,
        grads=jnp.zeros((3, Z, Y, X), dtype=dtype),
        pose=jnp.asarray(pose, dtype=jnp.float32),
        voxel_size=jnp.asarray(voxel_size, dtype=jnp.float32),
        truncdist=jnp.asarray(truncdist, dtype=jnp.float32),
        fg_counts=jnp.zeros((2, Z, Y, X), dtype=dtype) if with_fg else None,
    )


def volume_corners(res_xyz, voxel_size):
    """Low/high metric corners in the volume frame
    (reference ``TSDF::getCorners``, ``src/core/TSDF.cpp:81-86``)."""
    res = jnp.asarray(res_xyz, dtype=jnp.float32)
    corner = (res - 1.0) * voxel_size / 2.0
    return -corner, corner


def fg_probs(fg_counts: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel foreground probability fg/(fg+bg), 0 where no evidence
    (reference ``ObjTSDF::computeFgProbs``, ``src/core/ObjTSDF.cpp:218-226``)."""
    total = fg_counts[0] + fg_counts[1]
    return jnp.where(total > 0, fg_counts[0] / jnp.maximum(total, 1e-30),
                     0.0)
