import numpy as np
import jax.numpy as jnp

from emfusion_tpu.ops.fusion import compute_gradients
from emfusion_tpu.ops.marching_cubes import extract_mesh
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


def test_empty_volume():
    tsdf = np.ones((8, 8, 8), np.float32)
    grads = compute_gradients(jnp.asarray(tsdf))
    verts, norms, tris = extract_mesh(tsdf, grads,
                                      np.ones_like(tsdf, bool), 0.1,
                                      max_verts=1000, max_tris=1000)
    assert len(verts) == 0 and len(tris) == 0
