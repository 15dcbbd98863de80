import numpy as np
import jax.numpy as jnp

from emfusion_tpu.geometry import (
    trilinear_sample, sample_volume_at_points, world_to_grid, grid_to_world,
    backproject_depth, preprocess_depth,
)


def numpy_trilerp(vol, v):
    """Straight NumPy reference of the CUDA interpolateTrilinear."""
    x, y, z = v
    x0, y0, z0 = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
    fx, fy, fz = x - x0, y - y0, z - z0
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                       * (fz if dz else 1 - fz))
                out += wgt * vol[z0 + dz, y0 + dy, x0 + dx]
    return out


def test_trilinear_matches_numpy(rng):
    vol = rng.randn(6, 7, 8).astype(np.float32)
    pts = rng.uniform(0.2, 4.5, size=(50, 3)).astype(np.float32)
    out = np.asarray(trilinear_sample(
        jnp.asarray(vol), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2])))
    for i in range(50):
        expect = numpy_trilerp(vol, pts[i])
        np.testing.assert_allclose(out[i], expect, atol=1e-5)


def test_trilinear_at_grid_points(rng):
    vol = rng.randn(5, 5, 5).astype(np.float32)
    # exact grid point recovers the voxel value
    out = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.array([2.0]),
                                      jnp.array([3.0]), jnp.array([1.0])))
    np.testing.assert_allclose(out[0], vol[1, 3, 2], atol=1e-6)


def test_grid_world_roundtrip():
    res = (8, 10, 12)
    v = jnp.array([[1.0, 2.0, 3.0]])
    p = grid_to_world(v, res, 0.05)
    v2 = world_to_grid(p, res, 0.05)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)


def test_sample_volume_invalid_zones(rng):
    vol = jnp.asarray(rng.rand(8, 8, 8).astype(np.float32) + 1.0)
    # point behind camera -> 0
    pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]]).T
    out = np.asarray(sample_volume_at_points(
        vol, pts, jnp.eye(3), jnp.zeros(3), 0.1, margin=1))
    assert out[0] == 0.0
    assert out[1] == 0.0  # z == 0 invalid too

    # point far outside the volume -> 0
    pts = jnp.array([[10.0], [0.0], [1.0]])
    out = np.asarray(sample_volume_at_points(
        vol, pts, jnp.eye(3), jnp.zeros(3), 0.1, margin=1))
    assert out[0] == 0.0

    # point at volume center (grid coord 3.5 each) -> nonzero
    pts = jnp.array([[0.0], [0.0], [0.5]])
    rel_t = jnp.array([0.0, 0.0, -0.5])  # maps to origin in volume frame
    out = np.asarray(sample_volume_at_points(
        vol, pts, jnp.eye(3), rel_t, 0.1, margin=1))
    assert out[0] > 0.0


def test_margin_semantics(rng):
    """Reference: valid iff v + margin < res (strict)."""
    vol = jnp.ones((8, 8, 8))
    # grid coord exactly 6.5: v+1 = 7.5 < 8 ok for margin 1; v+2 = 8.5 >= 8
    # fails for margin 2.
    p = (6.5 - 3.5) * 0.1  # grid 6.5 -> object coord
    pts = jnp.array([[p], [0.0], [1.0]])
    rel_t = jnp.array([0.0, 0.0, -1.0])
    out1 = np.asarray(sample_volume_at_points(vol, pts, jnp.eye(3), rel_t,
                                              0.1, margin=1))
    out2 = np.asarray(sample_volume_at_points(vol, pts, jnp.eye(3), rel_t,
                                              0.1, margin=2))
    assert out1[0] == 1.0
    assert out2[0] == 0.0


def test_backproject_depth():
    intr = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)
    pts = np.asarray(backproject_depth(depth, intr))
    # center pixel: x=32 -> u=0
    np.testing.assert_allclose(pts[:, 24, 32], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(pts[:, 24, 42], [0.2, 0, 2.0], atol=1e-5)


def test_preprocess_depth_flat_region():
    # constant depth stays constant; zero pixels stay zero
    depth = np.full((32, 32), 1.5, np.float32)
    depth[5, 5] = 0.0
    out = np.asarray(preprocess_depth(jnp.asarray(depth)))
    assert out[5, 5] == 0.0
    np.testing.assert_allclose(out[20, 20], 1.5, atol=1e-4)


def test_preprocess_depth_edge_preserving():
    depth = np.full((32, 32), 1.0, np.float32)
    depth[:, 16:] = 3.0  # sharp step far larger than sigma_depth
    out = np.asarray(preprocess_depth(jnp.asarray(depth)))
    np.testing.assert_allclose(out[16, 10], 1.0, atol=1e-3)
    np.testing.assert_allclose(out[16, 20], 3.0, atol=1e-3)


def test_sample_system_matches_composed_path(rng):
    """Fused 27-corner system sampler == five separate sample calls
    (psi margin 1; grad = shifted margin-2 trilerp differences)."""
    from emfusion_tpu.geometry.sampling import sample_system_at_points

    vol = jnp.asarray(rng.randn(9, 10, 11).astype(np.float32))
    # points spanning interior, boundary bands and out-of-volume
    pts = rng.uniform(-0.8, 0.8, size=(3, 400)).astype(np.float32)
    pts[2] = rng.uniform(-0.2, 1.2, size=400)  # include z<=0 invalids
    pts = jnp.asarray(pts)
    R = jnp.asarray(np.array(
        [[0.936, -0.275, 0.218], [0.289, 0.957, -0.033],
         [-0.2, 0.094, 0.975]], np.float32))
    t = jnp.asarray(np.array([0.03, -0.05, 0.4], np.float32))
    vs = 0.09

    psi, g3 = sample_system_at_points(vol, pts, R, t, vs)

    psi_ref = sample_volume_at_points(vol, pts, R, t, vs, margin=1)
    base = sample_volume_at_points(vol, pts, R, t, vs, margin=2)

    def shifted(e):
        return sample_volume_at_points(vol, pts, R, t, vs, margin=2,
                                       grid_offset=e)

    g_ref = jnp.stack([shifted((1, 0, 0)) - base,
                       shifted((0, 1, 0)) - base,
                       shifted((0, 0, 1)) - base], axis=0) / vs

    np.testing.assert_allclose(np.asarray(psi), np.asarray(psi_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g_ref), atol=1e-4)


def test_row_gather_backend_matches_scalar():
    """The rows gather backend (9x (1,1,4) X-rows / 4x (1,1,2) pairs)
    must reproduce the scalar-take backend bit-for-bit, including
    boundary bands, out-of-volume and z<=0 points."""
    from emfusion_tpu.geometry import sampling

    rng2 = np.random.RandomState(7)
    vol = jnp.asarray(rng2.randn(8, 9, 10).astype(np.float32))
    cvol = jnp.asarray(rng2.randn(3, 8, 9, 10).astype(np.float32))
    pts = rng2.uniform(-1.0, 1.0, size=(3, 500)).astype(np.float32)
    pts[2] = rng2.uniform(-0.3, 1.5, size=500)
    pts = jnp.asarray(pts)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.asarray(np.array([0.02, -0.01, 0.35], np.float32))
    vs = 0.08

    orig = sampling._GATHER_BACKEND
    try:
        outs = {}
        for backend in ("scalar", "rows"):
            sampling._GATHER_BACKEND = backend
            psi, g3 = sampling.sample_system_at_points(vol, pts, R, t, vs)
            val = sampling.sample_volume_at_points(vol, pts, R, t, vs,
                                                   margin=1)
            cval = sampling.sample_volume_at_points(cvol, pts, R, t, vs,
                                                    margin=1)
            outs[backend] = (np.asarray(psi), np.asarray(g3),
                             np.asarray(val), np.asarray(cval))
    finally:
        sampling._GATHER_BACKEND = orig

    for a, b in zip(outs["scalar"], outs["rows"]):
        np.testing.assert_allclose(a, b, atol=1e-6)
