"""shard_map kernels for volume-sharded operation.

GSPMD handles the object-axis ("obj") sharding of the pool for free
(per-object programs are independent), but the pencil fusion's
``lax.scan`` over z slices defeats z-axis volume sharding: the
partitioner all-gathers the full tsdf/weights volumes before scanning
(verified from the compiled HLO — f32[Z,Y,X] all-gathers on dim 0).

Fusion is voxel-local, so the right structure is a ``shard_map`` over
the "z" mesh axis: every shard runs the plain slice scan over its LOCAL
slices with its local rows of the per-slice coefficient arrays
(``abg``/``camc`` shard together with the volume), the warped B-grids
stay replicated, and NO collectives are needed at all — fusion scales
linearly in z shards. This is the TPU analogue of the reference's
voxel-parallel ``kernel_updateTSDF`` grid (``src/core/cuda/TSDF.cu:
327-427``) distributed over chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emfusion_tpu.ops.fusion_pencil import _pencil_stage1, _scan_slices


def integrate_tsdf_pencil_zsharded(
        mesh: Mesh, tsdf, weights, depth, assoc_weights, rel_rot_oc,
        rel_trans_oc, intr, voxel_size, truncdist, max_weight,
        oversample: float = 1.25, bf16: bool = False,
        axis_name: str = "z", carve_dist=None, carve_weight_cap=None,
        carve_margin=None):
    """z-sharded drop-in for ``integrate_tsdf_pencil`` (axis=2 scan
    layout): the volume's leading (Z) axis is sharded over
    ``mesh[axis_name]``; outputs keep that sharding.

    Numerically identical to the unsharded path (each slice's math is
    untouched — only which device runs it changes).
    """
    tsdf = jnp.asarray(tsdf, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    H, W = depth.shape
    Z, Y, X = tsdf.shape
    SB = int(-(-int(H * oversample) // 8) * 8)
    LB = int(-(-int(W * oversample) // 128) * 128)

    Bmat, Binv, abg, camc, D_B, A_B, scal = _pencil_stage1(
        depth, jnp.asarray(assoc_weights, jnp.float32),
        jnp.asarray(rel_rot_oc), jnp.asarray(rel_trans_oc),
        jnp.asarray(intr), jnp.float32(voxel_size),
        (Z, Y, X), truncdist, max_weight, SB, LB,
        carve_dist=carve_dist, carve_weight_cap=carve_weight_cap,
        carve_margin=carve_margin)

    local = functools.partial(_scan_slices, SB=SB, LB=LB, bf16=bf16,
                              windowed=False, H=H, W=W)
    vol_spec = P(axis_name, None, None)
    row_spec = P(axis_name, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(vol_spec, vol_spec, P(), P(), row_spec, row_spec, P()),
        out_specs=(vol_spec, vol_spec))
    return fn(tsdf, weights, D_B, A_B, abg, camc, scal)


def extract_mesh_zsharded(mesh: Mesh, tsdf, grads, mask, voxel_size,
                          max_verts_per_shard: int = 262144,
                          max_tris_per_shard: int = 524288,
                          axis_name: str = "z"):
    """z-sharded marching cubes (reference two-pass MC:
    ``src/core/cuda/TSDF.cu:855-1152``; BASELINE stress config needs
    per-frame mesh export of volumes sharded across hosts).

    Each z shard meshes the cubes whose base plane it owns, using a
    one-plane halo of tsdf/grads/mask ppermute'd from the next shard
    (cross-boundary cubes belong to the lower shard; the classic CP-
    style halo). Vertices are emitted in GLOBAL volume coordinates via
    ``z_origin``; the host concatenates shard outputs, offsetting each
    shard's triangle indices by the preceding vertex counts.

    Returns (vertices (V,3), normals (V,3), triangles (T,3)) as numpy.
    """
    import numpy as np
    from emfusion_tpu.ops.marching_cubes import marching_cubes

    tsdf = jnp.asarray(tsdf, jnp.float32)
    Z = tsdf.shape[0]
    ns = mesh.shape[axis_name]
    zl = Z // ns
    voxel_size = jnp.float32(voxel_size)

    def local(t, g, m):
        idx = jax.lax.axis_index(axis_name)
        perm = [(i, (i - 1) % ns) for i in range(ns)]  # first plane -> prev

        def halo(x, plane_axis):
            first = jax.lax.slice_in_dim(x, 0, 1, axis=plane_axis)
            recv = jax.lax.ppermute(first, axis_name, perm)
            return jnp.concatenate([x, recv], axis=plane_axis)

        t2 = halo(t, 0)
        g2 = halo(g, 1)                     # grads channel-first (3,Z,Y,X)
        m2 = halo(m, 0)
        # the last shard's halo wraps to shard 0 — kill those cubes
        is_last = idx == ns - 1
        m2 = m2.at[-1].set(m2[-1] & ~is_last)
        z_origin = (idx * zl - (Z - 1) / 2.0) * voxel_size
        out = marching_cubes(t2, g2, m2, voxel_size,
                             max_verts=max_verts_per_shard,
                             max_tris=max_tris_per_shard,
                             z_origin=z_origin)
        return (out["vertices"][None], out["normals"][None],
                out["triangles"][None],
                out["num_verts"][None], out["num_tris"][None])

    spec_v = P(axis_name, None, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_v, P(None, axis_name, None, None), spec_v),
        out_specs=(P(axis_name, None, None), P(axis_name, None, None),
                   P(axis_name, None, None), P(axis_name), P(axis_name)))
    verts, norms, tris, nv, nt = fn(tsdf, jnp.asarray(grads),
                                    jnp.asarray(mask))
    verts, norms, tris = map(np.asarray, (verts, norms, tris))
    nv = np.asarray(nv).astype(np.int64)
    nt = np.asarray(nt).astype(np.int64)
    v_off = np.concatenate([[0], np.cumsum(nv)[:-1]])
    all_v, all_n, all_t = [], [], []
    for s in range(ns):
        all_v.append(verts[s, :nv[s]])
        all_n.append(norms[s, :nv[s]])
        all_t.append(tris[s, :nt[s]] + v_off[s])
    return (np.concatenate(all_v), np.concatenate(all_n),
            np.concatenate(all_t).astype(np.int32))
