"""Pallas bilateral filter vs the XLA reference (interior exactness)."""

import numpy as np
import jax.numpy as jnp

from emfusion_tpu.geometry.camera import bilateral_filter
from emfusion_tpu.ops.pallas.bilateral_pallas import bilateral_filter_pallas


def test_interior_matches_xla(rng):
    d = (1.0 + rng.rand(48, 64)).astype(np.float32)
    d[rng.rand(48, 64) < 0.1] = 0.0
    ref = np.asarray(bilateral_filter(jnp.asarray(d), 7, 0.04, 4.5))
    pal = np.asarray(bilateral_filter_pallas(jnp.asarray(d), 7, 0.04, 4.5,
                                             interpret=True))
    np.testing.assert_allclose(pal[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-5)


def test_zero_depth_stays_zero(rng):
    d = np.zeros((32, 32), np.float32)
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(d), 5, 0.04, 4.5,
                                             interpret=True))
    assert (out == 0).all()
