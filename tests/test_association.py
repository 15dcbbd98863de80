import numpy as np
import jax.numpy as jnp

from emfusion_tpu.ops.association import (
    compute_laplace, association_weights, normalize_associations,
)


def test_laplace_peak_at_surface(rng):
    # volume of zeros with weight: psi==0 is the invalid sentinel, so use
    # small values around the surface
    Z = Y = X = 16
    tsdf = np.full((Z, Y, X), 0.001, np.float32)
    pts = jnp.array([[0.0], [0.0], [1.0]])
    rel_t = jnp.array([0.0, 0.0, -1.0])
    sigma, trunc = 0.02, 0.1
    lap, invalid = compute_laplace(jnp.asarray(tsdf), pts, jnp.eye(3), rel_t,
                                   0.1, trunc, sigma)
    # near-surface sample: laplace close to 1/(2 sigma)
    got = float(np.asarray(lap)[0])
    expect = np.exp(-trunc * 0.001 / sigma) / (2 * sigma)
    np.testing.assert_allclose(got, expect, rtol=1e-4)
    assert not bool(np.asarray(invalid)[0])


def test_association_invalid_outside(rng):
    tsdf = np.full((8, 8, 8), 0.5, np.float32)
    pts = jnp.array([[5.0], [0.0], [1.0]])  # far outside
    w, _ = association_weights(jnp.asarray(tsdf), pts, jnp.eye(3),
                               jnp.array([0.0, 0.0, -1.0]), 0.1, 0.1,
                               0.02, 0.8, 1.0)
    assert float(np.asarray(w)[0]) == 0.0


def test_association_mixture(rng):
    tsdf = np.full((8, 8, 8), 0.5, np.float32)
    pts = jnp.array([[0.0], [0.0], [1.0]])
    rel_t = jnp.array([0.0, 0.0, -1.0])
    sigma, trunc, alpha, uni = 0.02, 0.1, 0.8, 1.0
    w, _ = association_weights(jnp.asarray(tsdf), pts, jnp.eye(3), rel_t,
                               0.1, trunc, sigma, alpha, uni)
    lap = np.exp(-trunc * 0.5 / sigma) / (2 * sigma)
    np.testing.assert_allclose(float(np.asarray(w)[0]),
                               alpha * lap + (1 - alpha) * uni, rtol=1e-4)


def test_association_fg_prob_scaling(rng):
    tsdf = np.full((8, 8, 8), 0.1, np.float32)
    fg = np.full((8, 8, 8), 0.25, np.float32)
    pts = jnp.array([[0.0], [0.0], [1.0]])
    rel_t = jnp.array([0.0, 0.0, -1.0])
    sigma, trunc, alpha, uni = 0.02, 0.1, 0.8, 1.0
    w_nofg, _ = association_weights(jnp.asarray(tsdf), pts, jnp.eye(3), rel_t,
                                    0.1, trunc, sigma, alpha, uni)
    w_fg, fgv = association_weights(jnp.asarray(tsdf), pts, jnp.eye(3), rel_t,
                                    0.1, trunc, sigma, alpha, uni,
                                    fg_prob_vol=jnp.asarray(fg))
    lap_nofg = (float(np.asarray(w_nofg)[0]) - (1 - alpha) * uni) / alpha
    lap_fg = (float(np.asarray(w_fg)[0]) - (1 - alpha) * uni) / alpha
    np.testing.assert_allclose(lap_fg, 0.25 * lap_nofg, rtol=1e-4)
    np.testing.assert_allclose(float(np.asarray(fgv)[0]), 0.25, rtol=1e-5)


def test_normalize_associations():
    H, W = 4, 4
    bg = jnp.full((H, W), 2.0)
    objs = jnp.stack([jnp.full((H, W), 1.0), jnp.full((H, W), 3.0),
                      jnp.full((H, W), 99.0)])
    active = jnp.array([True, True, False])
    bg_n, obj_n = normalize_associations(bg, objs, active)
    np.testing.assert_allclose(np.asarray(bg_n), 2.0 / 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obj_n)[0], 1.0 / 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obj_n)[1], 3.0 / 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obj_n)[2], 0.0)

    # all-zero pixel -> stays zero (0/0 guarded)
    bg0 = jnp.zeros((H, W))
    objs0 = jnp.zeros((3, H, W))
    bg_n, obj_n = normalize_associations(bg0, objs0, active)
    assert np.all(np.asarray(bg_n) == 0) and np.all(np.asarray(obj_n) == 0)
