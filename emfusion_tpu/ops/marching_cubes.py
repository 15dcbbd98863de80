"""Marching cubes as classify -> cumsum -> scatter-emit XLA programs.

TPU-native redesign of the reference's two-pass CUDA marching cubes
(``src/core/cuda/TSDF.cu:855-1152``): the classify pass and vertex/
triangle counting are vectorized table lookups; the reference's
``thrust::exclusive_scan`` becomes ``jnp.cumsum``; the emission pass is a
set of 12 (edges) + 5 (triangles) masked scatters into statically sized
output buffers (XLA needs static shapes; callers trim by the returned
counts).

Geometry conventions match the reference exactly: corner positions at
``(idx - (res-1)/2) * voxel``, vertex interpolation with the 1e-5
epsilon short-circuits (``vertexInterp``, ``TSDF.cu:909-920``), normals
from normalized corner gradients re-normalized after interpolation, and
cubes participate only when all 8 corners pass the validity mask
(``kernel_classifyCubes``, ``TSDF.cu:889-892``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emfusion_tpu.ops.mc_tables import (
    CORNER_OFFSETS, EDGE_CORNERS, EDGE_LOCAL_OFFSET, EDGE_TABLE, NUM_TRIS,
    NUM_VERTS, TRI_TABLE,
)


def _corner_values(vol: jnp.ndarray):
    """The 8 corner sub-volumes of shape (Z-1, Y-1, X-1) [+ channels]."""
    Z, Y, X = vol.shape[:3]
    outs = []
    for dx, dy, dz in np.asarray(CORNER_OFFSETS):
        outs.append(vol[dz:Z - 1 + dz, dy:Y - 1 + dy, dx:X - 1 + dx])
    return outs


def _vertex_interp(p1, p2, v1, v2):
    """vertexInterp semantics (TSDF.cu:909-920)."""
    v1e = v1[..., None]
    v2e = v2[..., None]
    denom = v2e - v1e
    mu = -v1e / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    out = p1 + mu * (p2 - p1)
    out = jnp.where(jnp.abs(denom) < 1e-5, p1, out)
    out = jnp.where(jnp.abs(v2e) < 1e-5, p2, out)
    out = jnp.where(jnp.abs(v1e) < 1e-5, p1, out)
    return out


def _normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n > 0, n, 1.0)


@functools.partial(jax.jit, static_argnames=("max_verts", "max_tris"))
def marching_cubes(tsdf: jnp.ndarray, grads: jnp.ndarray, mask: jnp.ndarray,
                   voxel_size, max_verts: int, max_tris: int,
                   z_origin=None):
    """Extract the zero isosurface.

    Args:
      tsdf: (Z, Y, X); grads: channel-first (3, Z, Y, X); mask: (Z, Y, X)
        bool validity.
      max_verts/max_tris: static output capacities.
      z_origin: world z of voxel plane 0 (default: volume-centered,
        ``-(Z-1)/2 * voxel``). Lets a z-shard emit vertices in GLOBAL
        volume coordinates (sharded marching cubes).

    Returns dict with ``vertices`` (max_verts, 3), ``normals``
    (max_verts, 3), ``triangles`` (max_tris, 3) int32 vertex indices,
    and scalar ``num_verts`` / ``num_tris``. Unused rows are zero /
    degenerate (0,0,0) triangles.
    """
    Z, Y, X = tsdf.shape
    if z_origin is None:
        z_origin = -(Z - 1) / 2.0 * voxel_size
    # meshing is export-cadence work; move channels last for the corner
    # slicing below (fine on any backend at this call rate)
    grads = jnp.moveaxis(grads, 0, -1)
    corners = _corner_values(tsdf)                     # 8 x (Z-1,Y-1,X-1)
    corner_mask = _corner_values(mask)
    cube_valid = corner_mask[0]
    for cm in corner_mask[1:]:
        cube_valid = cube_valid & cm

    cube_class = jnp.zeros(corners[0].shape, jnp.int32)
    for i, c in enumerate(corners):
        cube_class = cube_class | ((c < 0.0).astype(jnp.int32) << i)
    cube_class = jnp.where(cube_valid, cube_class, 0)

    nv_tab = jnp.asarray(NUM_VERTS)
    nt_tab = jnp.asarray(NUM_TRIS)
    nverts = jnp.take(nv_tab, cube_class).reshape(-1)
    ntris = jnp.take(nt_tab, cube_class).reshape(-1)

    vert_base = jnp.cumsum(nverts) - nverts            # exclusive scan
    tri_base = jnp.cumsum(ntris) - ntris
    num_verts = jnp.sum(nverts)
    num_tris = jnp.sum(ntris)

    # corner world positions and normalized corner normals
    shp = corners[0].shape
    zi = jax.lax.broadcasted_iota(jnp.float32, shp, 0)
    yi = jax.lax.broadcasted_iota(jnp.float32, shp, 1)
    xi = jax.lax.broadcasted_iota(jnp.float32, shp, 2)

    grad_corners = _corner_values(grads)

    def corner_pos(ci):
        dx, dy, dz = [int(v) for v in np.asarray(CORNER_OFFSETS)[ci]]
        return jnp.stack([
            (xi + dx - (X - 1) / 2.0) * voxel_size,
            (yi + dy - (Y - 1) / 2.0) * voxel_size,
            (zi + dz) * voxel_size + z_origin], axis=-1)

    vertex_interp = _vertex_interp
    normalize = _normalize

    edge_tab = jnp.asarray(EDGE_TABLE)
    loc_tab = jnp.asarray(EDGE_LOCAL_OFFSET)
    cls_flat = cube_class.reshape(-1)
    edge_bits = jnp.take(edge_tab, cls_flat)

    vertices = jnp.zeros((max_verts, 3), jnp.float32)
    normals = jnp.zeros((max_verts, 3), jnp.float32)

    for e in range(12):
        ca, cb = [int(v) for v in np.asarray(EDGE_CORNERS)[e]]
        active = ((edge_bits >> e) & 1) == 1
        local = jnp.take(loc_tab[:, e], cls_flat)
        idx = vert_base + local
        idx = jnp.where(active, idx, max_verts)        # OOB drop
        va = corners[ca].reshape(-1)
        vb = corners[cb].reshape(-1)
        pa = corner_pos(ca).reshape(-1, 3)
        pb = corner_pos(cb).reshape(-1, 3)
        na = normalize(grad_corners[ca].reshape(-1, 3))
        nb = normalize(grad_corners[cb].reshape(-1, 3))
        vpos = vertex_interp(pa, pb, va, vb)
        vnorm = normalize(vertex_interp(na, nb, va, vb))
        vertices = vertices.at[idx].set(vpos, mode="drop")
        normals = normals.at[idx].set(vnorm, mode="drop")

    tri_tab = jnp.asarray(TRI_TABLE)
    triangles = jnp.zeros((max_tris, 3), jnp.int32)
    for t in range(TRI_TABLE.shape[1] // 3):
        e0 = jnp.take(tri_tab[:, 3 * t + 0], cls_flat)
        e1 = jnp.take(tri_tab[:, 3 * t + 1], cls_flat)
        e2 = jnp.take(tri_tab[:, 3 * t + 2], cls_flat)
        active = e0 >= 0
        e0c = jnp.maximum(e0, 0)
        e1c = jnp.maximum(e1, 0)
        e2c = jnp.maximum(e2, 0)

        def vid(ec):
            # flat (cls*12 + e) take: a (n_cubes, 12) row-gather here was
            # the dominant emit-pass intermediate at 512^3 (NOTES_R3)
            local = jnp.take(loc_tab.reshape(-1), cls_flat * 12 + ec)
            return vert_base + local

        row = jnp.stack([vid(e0c), vid(e1c), vid(e2c)], axis=-1)
        tidx = jnp.where(active, tri_base + t, max_tris)
        triangles = triangles.at[tidx].set(row, mode="drop")

    return {
        "vertices": vertices, "normals": normals, "triangles": triangles,
        "num_verts": num_verts, "num_tris": num_tris,
    }


def extract_mesh(tsdf, grads, mask, voxel_size,
                 max_verts: int = 1_000_000,
                 max_tris: int = 2_000_000
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host convenience: run marching cubes and trim to actual counts.

    Returns (vertices (V,3), normals (V,3), triangles (T,3)) as numpy.
    """
    out = marching_cubes(jnp.asarray(tsdf), jnp.asarray(grads),
                         jnp.asarray(mask), float(voxel_size),
                         max_verts=max_verts, max_tris=max_tris)
    nv = int(out["num_verts"])
    nt = int(out["num_tris"])
    return (np.asarray(out["vertices"][:nv]),
            np.asarray(out["normals"][:nv]),
            np.asarray(out["triangles"][:nt]))


@functools.partial(jax.jit,
                   static_argnames=("zc", "max_verts", "max_tris"))
def _band_mesh(tsdf_pad, mask_pad, ov, ztop, voxel_size, z0f, zc: int,
               max_verts: int, max_tris: int):
    """One z-band of the chunked extraction: ``tsdf_pad``/``mask_pad``
    are (zc+2, Y, X) volume slices starting at global plane ``z0``
    (one halo slice past the band's cubes so the z forward-difference
    gradients at the band's top corner plane are exact). ``ov``
    (traced) masks out the first ``ov`` cube layers — the overlap of a
    clamped final band with the previous one. ``ztop``: local index of
    the GLOBAL top plane Z-1 (whose gradients the single-pass path
    zeroes), or any value > zc when outside this band. ``z0f``: global
    z of plane 0, in world units relative to the volume center."""
    from emfusion_tpu.ops.fusion import compute_gradients
    # the band's local-last-slice zeroing is sliced off below; interior
    # slices get the exact global forward difference via the halo slice
    grads = compute_gradients(tsdf_pad)
    gzi = jax.lax.broadcasted_iota(jnp.int32, tsdf_pad.shape, 0)
    grads = jnp.where((gzi == ztop)[None], 0.0, grads)[:, :zc + 1]
    zi = jax.lax.broadcasted_iota(jnp.int32, mask_pad[:zc + 1].shape, 0)
    m = mask_pad[:zc + 1] & (zi >= ov)
    return marching_cubes(tsdf_pad[:zc + 1], grads, m, voxel_size,
                          max_verts=max_verts, max_tris=max_tris,
                          z_origin=z0f)


def extract_mesh_chunked(tsdf, mask, voxel_size,
                         max_verts: int = 3_000_000,
                         max_tris: int = 6_000_000,
                         z_chunk: int = 32,
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-resolution mesh extraction via a host loop over z-bands.

    The single-pass emit materializes several (n_cubes,)-sized
    intermediates; at 512^3 (1.3e8 cubes) that OOMs a single chip's HBM
    (the reference meshes its full volume routinely,
    ``TSDF.cu:909-1152`` / ``EMFusion.cpp:1263-1300``). Cube emission is
    z-major and per-cube (no vertex sharing between cubes), so band
    outputs concatenated in z order are IDENTICAL to the single-pass
    output (parity-tested) while peak memory scales with ``z_chunk``.

    Gradients are computed per band (one halo slice), so no full-volume
    gradient array is ever materialized either. ``max_verts``/
    ``max_tris`` cap each band's static buffers; the concatenated totals
    are trimmed to the same caps.
    """
    tsdf = jnp.asarray(tsdf)
    if tsdf.dtype != jnp.float32:
        tsdf = tsdf.astype(jnp.float32)
    mask = jnp.asarray(mask)
    Z, Y, X = tsdf.shape
    zc = int(min(z_chunk, Z - 1))
    if zc < 4:
        from emfusion_tpu.ops.fusion import compute_gradients
        return extract_mesh(tsdf, compute_gradients(tsdf), mask,
                            voxel_size, max_verts=max_verts,
                            max_tris=max_tris)
    band_verts = max(min(max_verts, 1 << 19), 1 << 14)
    band_tris = max(min(max_tris, 1 << 20), 1 << 15)
    # one zero slice above the top plane lets every band (incl. the
    # final one, which covers cube layer Z-2 and reads plane Z-1) take
    # a uniform (zc+2)-slice window; the pad never feeds a cube (its
    # mask is False) and the top plane's gradients are zeroed via ztop
    tsdf_p = jnp.concatenate(
        [tsdf, jnp.zeros((1,) + tsdf.shape[1:], tsdf.dtype)], axis=0)
    mask_p = jnp.concatenate(
        [mask, jnp.zeros((1,) + mask.shape[1:], bool)], axis=0)
    vs_list, ns_list, ts_list = [], [], []
    vofs = 0
    next_cube = 0
    while next_cube < Z - 1:
        z0 = min(next_cube, Z - 1 - zc)
        ov = next_cube - z0
        z0f = (z0 - (Z - 1) / 2.0) * float(voxel_size)
        out = _band_mesh(
            jax.lax.dynamic_slice_in_dim(tsdf_p, z0, zc + 2, axis=0),
            jax.lax.dynamic_slice_in_dim(mask_p, z0, zc + 2, axis=0),
            jnp.int32(ov), jnp.int32(Z - 1 - z0), float(voxel_size),
            z0f, zc=zc, max_verts=band_verts, max_tris=band_tris)
        nv = int(out["num_verts"])
        nt = int(out["num_tris"])
        if nv > band_verts or nt > band_tris:
            raise ValueError(
                f"band [{z0}, {z0 + zc}) overflows the per-band mesh "
                f"buffers ({nv} verts / {nt} tris); raise max_verts or "
                f"lower z_chunk")
        if nv:
            vs_list.append(np.asarray(out["vertices"][:nv]))
            ns_list.append(np.asarray(out["normals"][:nv]))
            ts_list.append(np.asarray(out["triangles"][:nt]) + vofs)
            vofs += nv
        next_cube = z0 + zc
    if not vs_list:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.int32))
    verts = np.concatenate(vs_list)
    norms = np.concatenate(ns_list)
    tris = np.concatenate(ts_list)
    if len(verts) > max_verts or len(tris) > max_tris:
        verts = verts[:max_verts]
        norms = norms[:max_verts]
        tris = tris[np.all(tris < max_verts, axis=1)][:max_tris]
    return verts, norms, tris


# ----------------------------------------------------------------------
# Sparse (active-cube-compacted) extraction — the TPU production path.
#
# The dense scatter emission pays per-ROW scatter overhead for every
# cube in the volume (measured v5e: ~10 M rows/s regardless of row
# width), so 12 vertex + 5 triangle scatters over 512^3 cost minutes.
# Redesign: the device classifies, computes every cube's 12 candidate
# vertices/normals DENSELY (pure VPU math), and compacts all per-cube
# data with ONE wide scatter keyed by the active-cube rank (a cumsum)
# — one row per cube, so the row-count cost is paid once. The host
# fetches only the (M_active, 76) compacted rows and performs the
# pure-table packing (vertex ordering, triangle indexing) with numpy —
# identical output ordering to the dense path (parity-tested).
# ----------------------------------------------------------------------

def _make_stage_b_table() -> np.ndarray:
    """(256, 41) f32: per cube class [12 local vertex offsets | 12 edge
    active flags | num_verts | num_tris | 15 triangle LOCAL vertex
    offsets (EDGE_LOCAL_OFFSET composed with TRI_TABLE, -1 pad)] — one
    one-hot matmul replaces five scalar-gather table lookups."""
    loc = np.asarray(EDGE_LOCAL_OFFSET, np.float32)          # (256,12)
    eact = (((np.asarray(EDGE_TABLE)[:, None]
              >> np.arange(12)[None, :]) & 1)).astype(np.float32)
    nv = np.asarray(NUM_VERTS, np.float32)[:, None]
    nt = np.asarray(NUM_TRIS, np.float32)[:, None]
    tri = np.asarray(TRI_TABLE)                              # (256,15)
    tri_loc = np.where(
        tri >= 0,
        np.take_along_axis(np.asarray(EDGE_LOCAL_OFFSET),
                           np.maximum(tri, 0), axis=1),
        -1).astype(np.float32)
    return np.concatenate([loc, eact, nv, nt, tri_loc], axis=1)


_STAGE_B_TABLE = _make_stage_b_table()


@functools.partial(jax.jit,
                   static_argnames=("zc", "m_cap", "v_cap", "t_cap"))
def _band_sparse(tsdf_pad, mask_pad, ov, ztop, voxel_size, z0f,
                 zc: int, m_cap: int, v_cap: int = 1 << 18,
                 t_cap: int = 1 << 18):
    """Classify + dense 12-edge vertex math + two-stage compaction for
    one z band (see ``_band_mesh`` for the band/halo conventions).

    Stage A compacts all per-cube candidate data with ONE wide scatter
    keyed by the active-cube rank (row-count bound, ~64 M rows/s on
    v5e). Stage B then scatters the COMPACT cubes' vertices/triangles
    to their final positions (<= 17 rows/cube), so the host fetches
    only the finished 24 B/vertex + 12 B/triangle — the device->host
    relay sustains only ~20 MB/s, so fetch bytes dominate the export.

    Returns (verts (v_cap, 3) f32, norms (v_cap, 3) f16, tris
    (t_cap, 3) i32, counts (3,) i32 [n_active_cubes, n_verts,
    n_tris]). Normals are fetched at f16 (unit vectors; halves the
    relay traffic, ~20 MB/s through this tunnel).

    NOTE on ``zc``: the stage-A scatter operand is lane-padded to
    (n_cubes, 128) f32 on TPU regardless of the 75-column width, so the
    band size bounds peak HBM (~n_cubes * 512 B, plus a layout copy);
    zc=16 at 512^2 slices ~= 4.3 GB peak."""
    from emfusion_tpu.ops.fusion import compute_gradients
    grads = compute_gradients(tsdf_pad)
    gzi = jax.lax.broadcasted_iota(jnp.int32, tsdf_pad.shape, 0)
    grads = jnp.where((gzi == ztop)[None], 0.0, grads)[:, :zc + 1]
    tsdf = tsdf_pad[:zc + 1]
    zi0 = jax.lax.broadcasted_iota(jnp.int32, (zc + 1,) +
                                   tsdf_pad.shape[1:], 0)
    mask = mask_pad[:zc + 1] & (zi0 >= ov)

    Z, Y, X = tsdf.shape
    grads = jnp.moveaxis(grads, 0, -1)
    corners = _corner_values(tsdf)
    corner_mask = _corner_values(mask)
    cube_valid = corner_mask[0]
    for cm in corner_mask[1:]:
        cube_valid = cube_valid & cm
    cube_class = jnp.zeros(corners[0].shape, jnp.int32)
    for i, c in enumerate(corners):
        cube_class = cube_class | ((c < 0.0).astype(jnp.int32) << i)
    cube_class = jnp.where(cube_valid, cube_class, 0)
    # NUM_VERTS[cls] > 0 <=> cls not in {0, 255}: pure arithmetic — a
    # table take over every cube costs ~13 ms/M elems on v5e
    active = ((cube_class != 0) & (cube_class != 255)).reshape(-1)

    shp = corners[0].shape
    zi = jax.lax.broadcasted_iota(jnp.float32, shp, 0)
    yi = jax.lax.broadcasted_iota(jnp.float32, shp, 1)
    xi = jax.lax.broadcasted_iota(jnp.float32, shp, 2)
    grad_corners = _corner_values(grads)

    def corner_pos(ci):
        dx, dy, dz = [int(v) for v in np.asarray(CORNER_OFFSETS)[ci]]
        return jnp.stack([
            (xi + dx - (X - 1) / 2.0) * voxel_size,
            (yi + dy - (Y - 1) / 2.0) * voxel_size,
            (zi + dz) * voxel_size + z0f], axis=-1)

    cols = []
    for e in range(12):
        ca, cb = [int(v) for v in np.asarray(EDGE_CORNERS)[e]]
        va = corners[ca].reshape(-1)
        vb = corners[cb].reshape(-1)
        pa = corner_pos(ca).reshape(-1, 3)
        pb = corner_pos(cb).reshape(-1, 3)
        cols.append(_vertex_interp(pa, pb, va, vb))
    for e in range(12):
        ca, cb = [int(v) for v in np.asarray(EDGE_CORNERS)[e]]
        va = corners[ca].reshape(-1)
        vb = corners[cb].reshape(-1)
        na = _normalize(grad_corners[ca].reshape(-1, 3))
        nb = _normalize(grad_corners[cb].reshape(-1, 3))
        cols.append(_normalize(_vertex_interp(na, nb, va, vb)))
    n = cols[0].shape[0]
    flat_idx = jnp.arange(n, dtype=jnp.int32)
    cols.append(jnp.stack([cube_class.reshape(-1).astype(jnp.float32),
                           flat_idx.astype(jnp.float32),
                           jnp.zeros((n,), jnp.float32)], axis=-1))
    rows = jnp.concatenate(cols, axis=-1)            # (n, 75)

    rank = jnp.cumsum(active.astype(jnp.int32)) - 1
    idx = jnp.where(active, rank, m_cap)
    out = jnp.zeros((m_cap, 75), jnp.float32).at[idx].set(
        rows, mode="drop")
    n_active = jnp.sum(active.astype(jnp.int32))

    # ---- stage B: compact cubes -> final vertex/triangle buffers ----
    # All per-class table lookups ride ONE one-hot matmul (MXU) — the
    # scalar-gather table takes cost ~13 ms/M elems on v5e.
    cls_c = out[:, 72].astype(jnp.int32)             # (m_cap,)
    valid_c = jnp.arange(m_cap, dtype=jnp.int32) < n_active
    onehot = (cls_c[:, None] ==
              jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
                  jnp.float32)                       # (m_cap, 256)
    tabs = jnp.asarray(_STAGE_B_TABLE)               # (256, 41)
    vals = onehot @ tabs                             # exact: ints <= 12
    loc_c = vals[:, 0:12].astype(jnp.int32)          # (m_cap, 12)
    eact_c = vals[:, 12:24] > 0.5
    nv_c = jnp.where(valid_c, vals[:, 24].astype(jnp.int32), 0)
    nt_c = jnp.where(valid_c, vals[:, 25].astype(jnp.int32), 0)
    tri_loc = vals[:, 26:41].astype(jnp.int32)       # (m_cap, 15), -1 pad
    vb = jnp.cumsum(nv_c) - nv_c                     # exclusive
    tb = jnp.cumsum(nt_c) - nt_c
    n_verts = jnp.sum(nv_c)
    n_tris = jnp.sum(nt_c)

    vidx = jnp.where(eact_c & valid_c[:, None],
                     vb[:, None] + loc_c, v_cap).reshape(-1)
    verts_o = jnp.zeros((v_cap, 3), jnp.float32).at[vidx].set(
        out[:, :36].reshape(m_cap * 12, 3), mode="drop")
    norms_o = jnp.zeros((v_cap, 3), jnp.float16).at[vidx].set(
        out[:, 36:72].reshape(m_cap * 12, 3).astype(jnp.float16),
        mode="drop")

    tris = jnp.zeros((t_cap, 3), jnp.int32)
    for t in range(tri_loc.shape[1] // 3):
        lc = tri_loc[:, 3 * t:3 * t + 3]             # (m_cap, 3)
        act_t = (lc[:, 0] >= 0) & valid_c
        vid = vb[:, None] + jnp.maximum(lc, 0)
        tidx = jnp.where(act_t, tb + t, t_cap)
        tris = tris.at[tidx].set(vid, mode="drop")

    counts = jnp.stack([n_active, n_verts, n_tris])
    return verts_o, norms_o, tris, counts


def extract_mesh_sparse(tsdf, mask, voxel_size,
                        max_verts: int = 3_000_000,
                        max_tris: int = 6_000_000,
                        z_chunk: int = 16,
                        m_cap: int = 1 << 17,
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-resolution mesh extraction: device classify/math + one wide
    compaction scatter per z band, host table packing. Identical output
    to ``extract_mesh`` up to float-rounding of the banded z origin
    (parity-tested); runs 512^3 in seconds where the dense scatter
    emission takes minutes (see module comment).

    A band whose active-cube count exceeds ``m_cap`` is split in half
    recursively (halving ``z_chunk`` for that range)."""
    tsdf = jnp.asarray(tsdf)
    if tsdf.dtype != jnp.float32:
        tsdf = tsdf.astype(jnp.float32)
    mask = jnp.asarray(mask)
    Z, Y, X = tsdf.shape
    zc = int(min(z_chunk, Z - 1))
    if zc < 4:
        from emfusion_tpu.ops.fusion import compute_gradients
        return extract_mesh(tsdf, compute_gradients(tsdf), mask,
                            voxel_size, max_verts=max_verts,
                            max_tris=max_tris)
    tsdf_p = jnp.concatenate(
        [tsdf, jnp.zeros((1,) + tsdf.shape[1:], tsdf.dtype)], axis=0)
    mask_p = jnp.concatenate(
        [mask, jnp.zeros((1,) + mask.shape[1:], bool)], axis=0)

    vs_list, ns_list, ts_list = [], [], []
    vofs = 0

    v_cap = t_cap = 1 << 18
    from collections import deque

    def dispatch(z0, ov, zcb):
        z0f = (z0 - (Z - 1) / 2.0) * float(voxel_size)
        outs = _band_sparse(
            jax.lax.dynamic_slice_in_dim(tsdf_p, z0, zcb + 2, axis=0),
            jax.lax.dynamic_slice_in_dim(mask_p, z0, zcb + 2, axis=0),
            jnp.int32(ov), jnp.int32(Z - 1 - z0), float(voxel_size),
            z0f, zc=zcb, m_cap=m_cap, v_cap=v_cap, t_cap=t_cap)
        return (z0, ov, zcb) + outs

    # Round-structured dispatch (r5): on a tunneled device every
    # blocking fetch costs a full round trip (~25-30 ms), and the r4
    # one-band-lookahead loop paid ~4 of them per band (~128 RTTs at
    # 512^3/32 bands — most of the 6 s export). Now ALL bands of a
    # round dispatch back-to-back, their counts come home in ONE
    # stacked fetch, overflowing bands split into the next round, and
    # the payload is concatenated ON DEVICE (host-known counts slice
    # each band first) so the final result needs 3 fetches total.
    results = {}                 # z0 -> (verts_dev, norms_dev,
                                 #        tris_dev, nv, nt)

    jobs = deque()
    next_cube = 0
    while next_cube < Z - 1:
        z0 = min(next_cube, Z - 1 - zc)
        jobs.append((z0, next_cube - z0, zc))
        next_cube = z0 + zc

    while jobs:
        batch = [dispatch(*j) for j in jobs]
        jobs = deque()
        counts_all = np.asarray(jnp.stack([b[6] for b in batch]))
        for (z0, ov, zcb, verts_b, norms_b, tris_b, _), cnts in zip(
                batch, counts_all):
            m, nv, nt = (int(c) for c in cnts)
            if m > m_cap or nv > v_cap or nt > t_cap:
                if zcb < 8:
                    raise ValueError(
                        f"band [{z0}, {z0 + zcb}) overflows the "
                        f"sparse-MC caps ({m} cubes / {nv} verts / "
                        f"{nt} tris); raise m_cap")
                half = zcb // 2
                jobs.append((z0, min(ov, half), half))
                # cube layers [z0+half, z0+ov) were already emitted by
                # the previous band when ov > half -- the second half
                # inherits the residual overlap (ADVICE r4: dropping it
                # duplicated those layers' vertices/triangles).
                jobs.append((z0 + half, max(ov - half, 0), zcb - half))
                continue
            if nv == 0:
                continue
            results[z0] = (verts_b, norms_b, tris_b, nv, nt)

    # Per-band BUCKETED slices with pipelined async host copies, then
    # host-side concatenation/rebasing. Two constraints force this
    # shape (both measured r5): sequential fetches cost a ~25-30 ms
    # relay round trip EACH (async copies pipeline ~30x better), and
    # every distinct device graph shape — including a concatenate
    # whose input-length COMBINATION changed — recompiles through the
    # relay's AOT helper at seconds each. Bucketed per-band slice
    # shapes come from a ~16-element set and stay cached.
    fetches = []
    for z0 in sorted(results):
        v, n, t, nv, nt = results[z0]
        bv = min(_bucket(nv, 16384), v.shape[0])
        bt = min(_bucket(nt, 32768), t.shape[0])
        vv, nn, tt = v[:bv], n[:bv].astype(jnp.float32), t[:bt]
        for a in (vv, nn, tt):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        fetches.append((vv, nn, tt, nv, nt))

    for vv, nn, tt, nv, nt in fetches:
        vs_list.append(np.asarray(vv)[:nv])
        ns_list.append(np.asarray(nn)[:nv])
        ts_list.append(np.asarray(tt)[:nt].astype(np.int64) + vofs)
        vofs += nv

    if not vs_list:
        return (np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.int32))
    verts = np.concatenate(vs_list)
    norms = np.concatenate(ns_list)
    tris = np.concatenate(ts_list)
    if len(verts) > max_verts or len(tris) > max_tris:
        verts = verts[:max_verts]
        norms = norms[:max_verts]
        tris = tris[np.all(tris < max_verts, axis=1)][:max_tris]
    return verts, norms, tris.astype(np.int32)


def _bucket(n: int, q: int = 8192) -> int:
    """Quantize a fetch length to a small shape set: every DISTINCT
    host-slice shape compiles a new executable (through this image's
    relay AOT helper that costs seconds) — data-dependent exact-length
    fetches recompiled EVERY frame (measured: the 16-object stress
    export spent ~20 s/frame in compiles). Max ~20 shapes per cap."""
    return min(-(-max(n, 1) // q) * q, 1 << 62)


@functools.partial(jax.jit, static_argnames=("max_verts", "max_tris"))
def _pool_mc(tsdf_pool, grads_pool, mask_pool, voxel_sizes,
             max_verts: int, max_tris: int):
    """Marching cubes over an object POOL in ONE program (static
    unroll; a 64^3 dense extraction is ~0.1 ms on device — dispatch
    and fetch round trips dominated the per-object loop)."""
    K = tsdf_pool.shape[0]
    outs = []
    counts = []
    for k in range(K):
        o = marching_cubes(tsdf_pool[k].astype(jnp.float32),
                           grads_pool[k].astype(jnp.float32),
                           mask_pool[k], voxel_sizes[k],
                           max_verts=max_verts, max_tris=max_tris)
        outs.append((o["vertices"], o["normals"], o["triangles"]))
        counts.append(jnp.stack([o["num_verts"].astype(jnp.int32),
                                 o["num_tris"].astype(jnp.int32)]))
    return outs, jnp.stack(counts)


def extract_pool_meshes(tsdf_pool, grads_pool, mask_pool, voxel_sizes,
                        max_verts_per_obj: int = 0):
    """Host wrapper for :func:`_pool_mc`: one count fetch, then
    BUCKETED per-slot slices fetched with pipelined async host copies.

    Two relay pathologies this layout dodges (both measured r5):
    every blocking fetch costs a ~25-30 ms round trip (copies are
    started async for all slots, then collected), and every DISTINCT
    host-slice shape compiles a fresh executable through the relay's
    AOT helper at seconds each (slice lengths quantize to a small
    bucket set instead of the exact data-dependent counts). Packing
    the pool into one buffer device-side was measured WORSE: (N, 3)
    rows lane-pad to 512 B, so the pack copies moved ~50x the payload.

    Returns a list of (verts, norms, tris) numpy triples per slot."""
    K, R = tsdf_pool.shape[0], int(tsdf_pool.shape[1])
    mv = max_verts_per_obj or 4 * R * R
    outs, counts = _pool_mc(
        jnp.asarray(tsdf_pool), jnp.asarray(grads_pool),
        jnp.asarray(mask_pool), jnp.asarray(voxel_sizes),
        max_verts=mv, max_tris=2 * mv)
    c = np.asarray(counts)                 # fetch 1: per-slot counts
    slices = []
    for k in range(K):
        nv, nt = int(c[k, 0]), int(c[k, 1])
        bv = min(_bucket(nv, 4096), mv)
        bt = min(_bucket(nt, 8192), 2 * mv)
        v = outs[k][0][:bv]
        n = outs[k][1][:bv]
        t = outs[k][2][:bt]
        for a in (v, n, t):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        slices.append((v, n, t, nv, nt))
    return [(np.asarray(v)[:nv], np.asarray(n)[:nv],
             np.asarray(t)[:nt]) for v, n, t, nv, nt in slices]
