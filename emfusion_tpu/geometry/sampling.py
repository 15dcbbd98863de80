"""Trilinear volume sampling — the shared gather primitive.

TPU-native replacement for ``interpolateTrilinear``
(``include/EMFusion/core/cuda/TSDF.cuh:65-97``) and the
``kernel_getVolumeVals`` family (``src/core/cuda/TSDF.cu:662-726``).

Volumes are dense ``(Z, Y, X)`` or ``(Z, Y, X, C)`` float32 arrays. Grid
coordinates follow the reference convention: a point ``p`` in the volume
(object) frame maps to fractional index ``v = p / voxel_size + (res-1)/2``
per axis (X, Y, Z), and the voxel at integer index ``i`` sits at world
position ``(i - (res-1)/2) * voxel_size``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_to_world(idx_xyz: jnp.ndarray, res_xyz, voxel_size) -> jnp.ndarray:
    """Integer (or fractional) grid index (..., 3 as x,y,z) -> object-frame
    position. ``res_xyz`` is (X, Y, Z)."""
    res = jnp.asarray(res_xyz, dtype=jnp.float32)
    return (idx_xyz - (res - 1.0) / 2.0) * voxel_size


def world_to_grid(p_xyz: jnp.ndarray, res_xyz, voxel_size) -> jnp.ndarray:
    """Object-frame position (..., 3 as x,y,z) -> fractional grid index."""
    res = jnp.asarray(res_xyz, dtype=jnp.float32)
    return p_xyz / voxel_size + (res - 1.0) / 2.0


def trilinear_sample(vol: jnp.ndarray, v_xyz: jnp.ndarray,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Trilinear interpolation of ``vol`` (Z, Y, X) at fractional grid
    coords ``v_xyz`` (..., 3 ordered x, y, z).

    Out-of-range coords must be masked by ``valid`` (they are clamped for
    the gather and zeroed in the output). Matches the corner-weighting of
    the reference's ``interpolateTrilinear``.
    """
    return trilinear_sample_channels(vol[..., None], v_xyz, valid)[..., 0]


def trilinear_sample_channels(vol: jnp.ndarray, v_xyz: jnp.ndarray,
                              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Like :func:`trilinear_sample` for multi-channel volumes (Z, Y, X, C).

    Returns (..., C). A single flattened gather of the 8 corners per point
    keeps this XLA-friendly (one gather instruction, fused lerps).
    """
    Z, Y, X, C = vol.shape
    x = v_xyz[..., 0]
    y = v_xyz[..., 1]
    z = v_xyz[..., 2]

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0

    x0c = jnp.clip(x0, 0, X - 2)
    y0c = jnp.clip(y0, 0, Y - 2)
    z0c = jnp.clip(z0, 0, Z - 2)

    flat = vol.reshape(-1, C)
    base = (z0c * Y + y0c) * X + x0c

    def corner(dz, dy, dx):
        idx = base + (dz * Y + dy) * X + dx
        return jnp.take(flat, idx, axis=0)

    c000 = corner(0, 0, 0)
    c001 = corner(0, 0, 1)
    c010 = corner(0, 1, 0)
    c011 = corner(0, 1, 1)
    c100 = corner(1, 0, 0)
    c101 = corner(1, 0, 1)
    c110 = corner(1, 1, 0)
    c111 = corner(1, 1, 1)

    fx = fx[..., None]
    fy = fy[..., None]
    fz = fz[..., None]
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fz) + c1 * fz

    if valid is not None:
        out = jnp.where(valid[..., None], out, 0.0)
    return out


def sample_volume_at_points(vol: jnp.ndarray, points_cam: jnp.ndarray,
                            rel_rot: jnp.ndarray, rel_trans: jnp.ndarray,
                            voxel_size, margin: int = 1) -> jnp.ndarray:
    """Sample a volume at camera-space points after a rigid transform.

    TPU equivalent of ``kernel_getVolumeVals`` (``TSDF.cu:662-726``):
    ``p = R p_cam + t``, ``v = p/voxel + (res-1)/2``; result is 0 where the
    point is invalid (``z_cam <= 0``) or where ``v`` is outside
    ``[0, res - 1 - margin)`` on any axis (reference uses margin 1 for value
    sampling, margin 2 for gradient-based sampling).

    ``vol`` is (Z, Y, X) or (Z, Y, X, C); returns points' leading shape
    (+ C if multi-channel).
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    Z, Y, X, _ = vol.shape
    res = jnp.array([X, Y, Z], dtype=jnp.float32)

    p = points_cam @ rel_rot.T + rel_trans
    v = p / voxel_size + (res - 1.0) / 2.0
    valid = points_cam[..., 2] > 0
    valid &= jnp.all(v >= 0.0, axis=-1)
    valid &= jnp.all(v + margin < res, axis=-1)
    out = trilinear_sample_channels(vol, v, valid)
    return out[..., 0] if squeeze else out
