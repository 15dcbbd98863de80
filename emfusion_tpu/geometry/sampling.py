"""Trilinear volume sampling — the shared gather primitive.

TPU-native replacement for ``interpolateTrilinear``
(``include/EMFusion/core/cuda/TSDF.cuh:65-97``) and the
``kernel_getVolumeVals`` family (``src/core/cuda/TSDF.cu:662-726``).

Layout note (TPU): arrays are tiled (8, 128) over their two minor dims,
so a trailing channel axis of size 3 would be padded to 128 (42x memory).
All multi-channel volumes are therefore **channel-first** ``(C, Z, Y, X)``
and point clouds are component-first ``(3, N)`` / ``(3, H, W)``.

Grid coordinates follow the reference convention: a point ``p`` in the
volume (object) frame maps to fractional index ``v = p / voxel_size +
(res-1)/2`` per axis (X, Y, Z), and the voxel at integer index ``i`` sits
at object-frame position ``(i - (res-1)/2) * voxel_size``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Gather strategy for the trilinear samplers. XLA:TPU lowers an arbitrary
# gather to a scalar loop (~0.1 G elem/s measured on v5e). The "rows"
# backend expresses the X-contiguous trilerp corners as (1,1,L) row
# gathers (8-corner -> 4 rows, 27-corner -> 9 rows + lane one-hot);
# measured on v5e it is ~13% SLOWER (20.7 vs 18.3 ms/LM-iter at 512^3):
# the gather loop costs per ELEMENT, not per row, so fewer-but-wider
# gathers do not help. Kept selectable (EMF_GATHER=rows) as the recorded
# negative result; default remains the scalar-take formulation.
#
# NOTE: the env var is read at import time; set it before importing
# emfusion_tpu (tests that need to switch after import assign
# ``sampling._GATHER_BACKEND`` directly).
_GATHER_BACKEND = os.environ.get("EMF_GATHER", "scalar")


def _row_gather(vol: jnp.ndarray, zi, yi, xs, L: int) -> jnp.ndarray:
    """Gather length-``L`` X-contiguous rows at integer starts.

    ``vol`` is (Z, Y, X) or channel-first (C, Z, Y, X); ``zi``/``yi`` are
    exact (already clipped) voxel indices, ``xs`` a row start with
    ``xs + L <= X`` guaranteed by the caller. All index arrays are flat
    (N,). Returns (N, L) or (N, C, L).
    """
    starts = jnp.stack([zi, yi, xs], axis=-1)
    if vol.ndim == 3:
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2))
        return lax.gather(vol, starts, dn, slice_sizes=(1, 1, L),
                          mode="clip")
    C = vol.shape[0]
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2, 3))
    return lax.gather(vol, starts, dn, slice_sizes=(C, 1, 1, L),
                      mode="clip")


def grid_to_world(idx_xyz: jnp.ndarray, res_xyz, voxel_size) -> jnp.ndarray:
    """Integer (or fractional) grid index (..., 3 as x,y,z) -> object-frame
    position. ``res_xyz`` is (X, Y, Z)."""
    res = jnp.asarray(res_xyz, dtype=jnp.float32)
    return (idx_xyz - (res - 1.0) / 2.0) * voxel_size


def world_to_grid(p_xyz: jnp.ndarray, res_xyz, voxel_size) -> jnp.ndarray:
    """Object-frame position (..., 3 as x,y,z) -> fractional grid index."""
    res = jnp.asarray(res_xyz, dtype=jnp.float32)
    return p_xyz / voxel_size + (res - 1.0) / 2.0


def trilinear_sample(vol: jnp.ndarray, vx, vy, vz,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Trilinear interpolation of ``vol`` (Z, Y, X) at fractional grid
    coords given as separate arrays ``vx, vy, vz`` (any common shape).

    Out-of-range coords must be masked by ``valid`` (they are clamped for
    the gather and zeroed in the output). Matches the corner-weighting of
    the reference's ``interpolateTrilinear``.
    """
    return trilinear_sample_channels(vol[None], vx, vy, vz, valid)[0]


def trilinear_sample_channels(vol: jnp.ndarray, vx, vy, vz,
                              valid: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Like :func:`trilinear_sample` for channel-first volumes
    (C, Z, Y, X). Returns (C, ...)."""
    C, Z, Y, X = vol.shape

    x0 = jnp.floor(vx).astype(jnp.int32)
    y0 = jnp.floor(vy).astype(jnp.int32)
    z0 = jnp.floor(vz).astype(jnp.int32)
    fx = vx - x0
    fy = vy - y0
    fz = vz - z0

    x0c = jnp.clip(x0, 0, X - 2)
    y0c = jnp.clip(y0, 0, Y - 2)
    z0c = jnp.clip(z0, 0, Z - 2)

    if _GATHER_BACKEND == "rows" and X >= 2:
        # X >= 2 guard: the (.,1,1,2) row gather needs two lanes; degenerate
        # volumes fall through to the scalar-take path (which clips).
        shp = x0c.shape
        z0f = z0c.reshape(-1)
        y0f = y0c.reshape(-1)
        x0f = x0c.reshape(-1)
        fxf = fx.reshape(-1)[:, None]  # (N, 1) broadcasts over C

        def cpair(dz, dy):
            # (N, C, 2) row of the two X-contiguous corners, lerped over X
            row = _row_gather(vol, z0f + dz, y0f + dy, x0f, 2)
            return row[..., 0] * (1 - fxf) + row[..., 1] * fxf

        c00 = cpair(0, 0)
        c01 = cpair(0, 1)
        c10 = cpair(1, 0)
        c11 = cpair(1, 1)
        fyf = fy.reshape(-1)[:, None]
        fzf = fz.reshape(-1)[:, None]
        c0 = c00 * (1 - fyf) + c01 * fyf
        c1 = c10 * (1 - fyf) + c11 * fyf
        out = (c0 * (1 - fzf) + c1 * fzf)          # (N, C)
        out = jnp.moveaxis(out, -1, 0).reshape((C,) + shp)
    else:
        flat = vol.reshape(C, -1)
        base = (z0c * Y + y0c) * X + x0c

        def corner(dz, dy, dx):
            idx = base + (dz * Y + dy) * X + dx
            # gather along the flat voxel axis for each channel
            return jnp.take(flat, idx, axis=1)

        c000 = corner(0, 0, 0)
        c001 = corner(0, 0, 1)
        c010 = corner(0, 1, 0)
        c011 = corner(0, 1, 1)
        c100 = corner(1, 0, 0)
        c101 = corner(1, 0, 1)
        c110 = corner(1, 1, 0)
        c111 = corner(1, 1, 1)

        c00 = c000 * (1 - fx) + c001 * fx
        c01 = c010 * (1 - fx) + c011 * fx
        c10 = c100 * (1 - fx) + c101 * fx
        c11 = c110 * (1 - fx) + c111 * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        out = c0 * (1 - fz) + c1 * fz

    if valid is not None:
        out = jnp.where(valid[None], out, 0.0)
    return out


def _transform_to_grid(points_cam, rel_rot, rel_trans, voxel_size, shape):
    """Rigid transform + world->grid for component-first points."""
    Z, Y, X = shape
    px, py, pz = points_cam[0], points_cam[1], points_cam[2]
    wx = rel_rot[0, 0] * px + rel_rot[0, 1] * py + rel_rot[0, 2] * pz \
        + rel_trans[0]
    wy = rel_rot[1, 0] * px + rel_rot[1, 1] * py + rel_rot[1, 2] * pz \
        + rel_trans[1]
    wz = rel_rot[2, 0] * px + rel_rot[2, 1] * py + rel_rot[2, 2] * pz \
        + rel_trans[2]
    vx = wx / voxel_size + (X - 1.0) / 2.0
    vy = wy / voxel_size + (Y - 1.0) / 2.0
    vz = wz / voxel_size + (Z - 1.0) / 2.0
    return vx, vy, vz, pz


def sample_system_at_points(vol: jnp.ndarray, points_cam: jnp.ndarray,
                            rel_rot: jnp.ndarray, rel_trans: jnp.ndarray,
                            voxel_size):
    """Fused residual + finite-difference-gradient sampling for tracking.

    Equivalent to five :func:`sample_volume_at_points` calls — the
    margin-1 value (``kernel_getVolumeVals``, ``TSDF.cu:662-726``) plus
    the margin-2 base and three axis-shifted trilerps whose differences
    give the SDF gradient (``kernel_computePoseGradients``,
    ``TSDF.cu:603-660``) — but gathers the shared 3x3x3 corner
    neighborhood ONCE (27 elements/point instead of 40). On TPU, XLA
    gathers run as a scalar loop (~0.1 G elem/s), so tracking cost is
    proportional to gathered-element count; this is the LM hot path.

    Returns ``(psi, g3)`` with ``psi`` shaped like the points' trailing
    shape and ``g3`` of shape ``(3,) + trailing`` (already divided by
    ``voxel_size``).
    """
    Z, Y, X = vol.shape
    vx, vy, vz, pz = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                        voxel_size, (Z, Y, X))

    x0 = jnp.floor(vx).astype(jnp.int32)
    y0 = jnp.floor(vy).astype(jnp.int32)
    z0 = jnp.floor(vz).astype(jnp.int32)
    fx = vx - x0
    fy = vy - y0
    fz = vz - z0

    yi = [jnp.clip(y0 + d, 0, Y - 1) for d in range(3)]
    zi = [jnp.clip(z0 + d, 0, Z - 1) for d in range(3)]

    if _GATHER_BACKEND == "rows" and X >= 4:
        # 9 gathers of (1,1,4) X-rows instead of 27 scalar takes. Row
        # start sx = clip(x0, 0, X-4) and lane bx_d = clip(x0+d-sx, 0, 3)
        # reproduce clip(x0+d, 0, X-1) exactly: for x0 in [0, X-4] the
        # window covers x0..x0+3; for x0 > X-4 both reduce to
        # min(x0+d, X-1); for x0 < 0 both reduce to max(x0+d, 0) (d<=2
        # keeps x0+d < 3). Lane extraction is a 4-wide one-hot dot (VPU).
        shp = x0.shape
        x0f = x0.reshape(-1)
        sx = jnp.clip(x0f, 0, X - 4)
        lane = [(jnp.clip(x0f + d - sx, 0, 3)[:, None]
                 == jnp.arange(4)[None]).astype(vol.dtype) for d in range(3)]

        def crow(dz, dy):
            row = _row_gather(vol, zi[dz].reshape(-1), yi[dy].reshape(-1),
                              sx, 4)                        # (N, 4)
            return [jnp.sum(row * lane[d], axis=-1).reshape(shp)
                    for d in range(3)]

        c = [[crow(dz, dy) for dy in range(3)] for dz in range(3)]
    else:
        flat = vol.reshape(-1)
        xi = [jnp.clip(x0 + d, 0, X - 1) for d in range(3)]

        # 27-corner cube c[dz][dy][dx]
        c = [[[jnp.take(flat, (zi[dz] * Y + yi[dy]) * X + xi[dx])
               for dx in range(3)] for dy in range(3)] for dz in range(3)]

    def trilerp(oz, oy, ox):
        def lx(dy, dz):
            return c[dz][dy][ox] * (1 - fx) + c[dz][dy][ox + 1] * fx

        def ly(dz):
            return lx(oy, dz) * (1 - fy) + lx(oy + 1, dz) * fy

        return ly(oz) * (1 - fz) + ly(oz + 1) * fz

    base_val = trilerp(0, 0, 0)

    inside = (pz > 0) & (vx >= 0.0) & (vy >= 0.0) & (vz >= 0.0)
    valid1 = inside & (vx + 1 < X) & (vy + 1 < Y) & (vz + 1 < Z)
    valid2 = inside & (vx + 2 < X) & (vy + 2 < Y) & (vz + 2 < Z)
    psi = jnp.where(valid1, base_val, 0.0)
    base = jnp.where(valid2, base_val, 0.0)

    # shifted trilerps: integer grid shift leaves the fractions unchanged;
    # per-shift validity matches sample_volume_at_points(grid_offset=e)
    # (bounds are evaluated on the SHIFTED coords, e.g. vx+1 >= 0).
    def vld(ex, ey, ez):
        return ((pz > 0)
                & (vx + ex >= 0.0) & (vy + ey >= 0.0) & (vz + ez >= 0.0)
                & (vx + ex + 2 < X) & (vy + ey + 2 < Y) & (vz + ez + 2 < Z))

    sx = jnp.where(vld(1, 0, 0), trilerp(0, 0, 1), 0.0)
    sy = jnp.where(vld(0, 1, 0), trilerp(0, 1, 0), 0.0)
    sz = jnp.where(vld(0, 0, 1), trilerp(1, 0, 0), 0.0)
    g3 = jnp.stack([sx - base, sy - base, sz - base], axis=0) / voxel_size
    return psi, g3


def sample_volume_at_points(vol: jnp.ndarray, points_cam: jnp.ndarray,
                            rel_rot: jnp.ndarray, rel_trans: jnp.ndarray,
                            voxel_size, margin: int = 1,
                            grid_offset=None) -> jnp.ndarray:
    """Sample a volume at camera-space points after a rigid transform.

    TPU equivalent of ``kernel_getVolumeVals`` (``TSDF.cu:662-726``):
    ``p = R p_cam + t``, ``v = p/voxel + (res-1)/2``; result is 0 where the
    point is invalid (``z_cam <= 0``) or where ``v`` is outside
    ``[0, res - 1 - margin)`` on any axis (reference uses margin 1 for
    value sampling, margin 2 for gradient-based sampling).

    ``points_cam`` is component-first (3, ...). ``vol`` is (Z, Y, X) or
    channel-first (C, Z, Y, X); returns the points' trailing shape
    (with leading C if multi-channel).
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    C, Z, Y, X = vol.shape

    px, py, pz = points_cam[0], points_cam[1], points_cam[2]
    wx = rel_rot[0, 0] * px + rel_rot[0, 1] * py + rel_rot[0, 2] * pz \
        + rel_trans[0]
    wy = rel_rot[1, 0] * px + rel_rot[1, 1] * py + rel_rot[1, 2] * pz \
        + rel_trans[1]
    wz = rel_rot[2, 0] * px + rel_rot[2, 1] * py + rel_rot[2, 2] * pz \
        + rel_trans[2]
    vx = wx / voxel_size + (X - 1.0) / 2.0
    vy = wy / voxel_size + (Y - 1.0) / 2.0
    vz = wz / voxel_size + (Z - 1.0) / 2.0
    if grid_offset is not None:
        # integer voxel shift (finite-difference gradient sampling:
        # trilerp(forward-diff, v) == trilerp(vol, v+e) - trilerp(vol, v))
        vx = vx + grid_offset[0]
        vy = vy + grid_offset[1]
        vz = vz + grid_offset[2]

    valid = pz > 0
    valid &= (vx >= 0.0) & (vy >= 0.0) & (vz >= 0.0)
    valid &= (vx + margin < X) & (vy + margin < Y) & (vz + margin < Z)
    out = trilinear_sample_channels(vol, vx, vy, vz, valid)
    return out[0] if squeeze else out
