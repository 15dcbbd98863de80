import numpy as np
import jax.numpy as jnp

from emfusion_tpu.ops.fusion import compute_gradients
from emfusion_tpu.ops.marching_cubes import (extract_mesh,
                                             extract_mesh_chunked,
                                             extract_mesh_sparse)
from emfusion_tpu.ops.mc_tables import EDGE_TABLE, TRI_TABLE, NUM_VERTS
from tests.test_raycast import sphere_volume


def test_tables_consistent():
    # every edge used by a triangulation is flagged in the edge table
    for c in range(256):
        row = TRI_TABLE[c]
        used = set(int(e) for e in row if e >= 0)
        flagged = set(e for e in range(12) if EDGE_TABLE[c] & (1 << e))
        assert used == flagged, c
    # complementary configs use the same edge sets (MC symmetry)
    for c in range(256):
        assert EDGE_TABLE[c] == EDGE_TABLE[255 - c], c
    assert EDGE_TABLE[0] == 0 and EDGE_TABLE[255] == 0
    assert NUM_VERTS[1] == 3  # single corner -> triangle cut


def make_mesh(res=32, radius=0.5, voxel=0.05, trunc=0.25):
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    mask = weights > 0
    return extract_mesh(tsdf, grads, mask, voxel,
                        max_verts=200_000, max_tris=200_000)


def test_sphere_vertices_on_surface():
    radius = 0.5
    verts, norms, tris = make_mesh(radius=radius)
    assert len(verts) > 500
    r = np.linalg.norm(verts, axis=1)
    # every vertex within ~half voxel of the sphere
    np.testing.assert_array_less(np.abs(r - radius), 0.03)
    # normals approximately radial (outward)
    cos = np.sum(norms * verts / r[:, None], axis=1)
    assert cos.mean() > 0.97


def test_sphere_area_and_topology():
    radius = 0.5
    verts, norms, tris = make_mesh(radius=radius)
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = areas.sum()
    expect = 4 * np.pi * radius ** 2
    assert abs(total - expect) / expect < 0.05, (total, expect)

    # watertight after welding duplicate vertices (like the reference, each
    # cube emits its own copies of shared edge vertices): every welded
    # undirected edge must appear exactly twice, every directed edge once
    # (consistent winding).
    key = np.round(verts / 1e-4).astype(np.int64)
    uniq, weld = np.unique(key, axis=0, return_inverse=True)
    wt = weld[tris]
    edges = {}
    dir_edges = set()
    for t in wt:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
            assert (a, b) not in dir_edges, "inconsistent winding"
            dir_edges.add((a, b))
    counts = np.array(list(edges.values()))
    assert (counts == 2).all(), np.unique(counts)
    # Euler characteristic of a sphere: V - E + F = 2
    V, E, F = len(uniq), len(edges), len(wt)
    assert V - E + F == 2, (V, E, F)


def test_mask_limits_extraction():
    tsdf, weights = sphere_volume(24, 0.05, 0.4, 0.25)
    grads = compute_gradients(jnp.asarray(tsdf))
    # masking out the top half keeps only the bottom hemisphere
    mask = np.ones_like(tsdf, bool)
    mask[:, :12, :] = False
    verts, _, tris = extract_mesh(tsdf, grads, mask, 0.05,
                                  max_verts=100_000, max_tris=100_000)
    assert len(verts) > 100
    assert (verts[:, 1] >= -0.05).all()  # only y >= boundary region


def test_chunked_matches_single_pass():
    """The z-chunked extraction (512^3-capable path: no full-volume
    intermediates) must emit EXACTLY the single-pass mesh: cube emission
    is z-major and per-cube, so band concatenation preserves order."""
    res = 48
    tsdf, weights = sphere_volume(res, 0.05, 0.8, 0.25)
    grads = compute_gradients(jnp.asarray(tsdf))
    mask = weights > 0
    v1, n1, t1 = extract_mesh(tsdf, grads, mask, 0.05,
                              max_verts=300_000, max_tris=300_000)
    # z_chunk that does NOT divide res-1 exercises the clamped+overlap
    # final band
    for zc in (13, 16):
        v2, n2, t2 = extract_mesh_chunked(tsdf, mask, 0.05,
                                          max_verts=300_000,
                                          max_tris=300_000, z_chunk=zc)
        assert len(v1) == len(v2) and len(t1) == len(t2), zc
        # identical emission order; verts differ only by the rounding of
        # (zi_local*v + z_origin) vs (zi_global*v + global_origin)
        np.testing.assert_allclose(v1, v2, atol=1e-5)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(t1, t2)


def test_sparse_matches_single_pass():
    """The sparse (wide-scatter compaction + host packing) extractor —
    the TPU production path for 512^3 meshing — must reproduce the
    dense path exactly, including under band splits (tiny m_cap)."""
    res = 48
    tsdf, weights = sphere_volume(res, 0.05, 0.8, 0.25)
    grads = compute_gradients(jnp.asarray(tsdf))
    mask = weights > 0
    v1, n1, t1 = extract_mesh(tsdf, grads, mask, 0.05,
                              max_verts=300_000, max_tris=300_000)
    # (32, 700): the clamped band spawns as (z0=15, ov=17, zc=32) and
    # the tiny m_cap splits it with ov > half -- the second half must
    # inherit the residual overlap (ADVICE r4: it was enqueued with
    # ov=0, silently re-emitting already-emitted cube layers). 700 sits
    # between this sphere's max 4-layer window (656 cubes, so the
    # recursion terminates) and the band's post-skip content (1161, so
    # it does split).
    for zc, mc in ((13, 1 << 17), (16, 1 << 17), (48, 2048), (32, 700)):
        v2, n2, t2 = extract_mesh_sparse(tsdf, mask, 0.05,
                                         max_verts=300_000,
                                         max_tris=300_000, z_chunk=zc,
                                         m_cap=mc)
        assert len(v1) == len(v2) and len(t1) == len(t2), (zc, mc)
        np.testing.assert_allclose(v1, v2, atol=1e-5)
        # normals travel at f16 (relay-traffic halving; unit vectors)
        np.testing.assert_allclose(n1, n2, atol=1e-3)
        np.testing.assert_array_equal(t1, t2)


def test_chunked_empty_and_small():
    tsdf = np.ones((8, 8, 8), np.float32)
    verts, norms, tris = extract_mesh_chunked(
        tsdf, np.ones_like(tsdf, bool), 0.1, z_chunk=4)
    assert len(verts) == 0 and len(tris) == 0
    # volume smaller than any chunk falls back to single-pass
    tsdf, weights = sphere_volume(5, 0.1, 0.2, 0.3)
    v, n, t = extract_mesh_chunked(tsdf, weights > 0, 0.1, z_chunk=32)
    g = compute_gradients(jnp.asarray(tsdf))
    v1, n1, t1 = extract_mesh(tsdf, g, weights > 0, 0.1)
    np.testing.assert_array_equal(v, v1)


def test_empty_volume():
    tsdf = np.ones((8, 8, 8), np.float32)
    grads = compute_gradients(jnp.asarray(tsdf))
    verts, norms, tris = extract_mesh(tsdf, grads,
                                      np.ones_like(tsdf, bool), 0.1,
                                      max_verts=1000, max_tris=1000)
    assert len(verts) == 0 and len(tris) == 0
