"""Interpret-mode parity tests for the Pallas projective warp kernel.

``ops/pallas/warp_pallas.py`` vs the XLA formulations it replaces:
  * ``fusion_pencil.warp_image_to_grid`` (stage-1 pencil warp,
    nearest-pixel select with out-of-bounds zeroing);
  * the sweep raycast's pixel -> B-grid clip-only lookup
    (``ops/raycast_sweep.py:181-185``).

Both call sites route to XLA paths on CPU in production, so these tests
drive the kernel explicitly with ``interpret=True`` — including
non-8/128-aligned source shapes, where the kernel must clamp to the
TRUE image edge rather than reading VMEM padding zeros.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from emfusion_tpu.ops.fusion_pencil import warp_image_to_grid
from emfusion_tpu.ops.pallas.warp_pallas import (
    select_grid_at_pixels_pallas, warp_image_to_grid_pallas,
)


def _rand_img(H, W, seed=0):
    rng = np.random.RandomState(seed)
    # strictly positive values so a wrongly-selected padding zero can
    # never masquerade as a legitimate sample
    return jnp.asarray((0.5 + rng.rand(H, W)).astype(np.float32))


@pytest.mark.parametrize("H,W", [(480, 640), (123, 200), (96, 128)])
def test_warp_image_to_grid_parity(H, W):
    Bmat = jnp.asarray(np.array(
        [[W * 0.12, 2.0, W * 0.3],
         [1.5, H * 0.11, H * 0.25],
         [0.013, 0.007, 1.0]], np.float32))
    img = _rand_img(H, W)
    a0, b0, da, db = -0.7, -0.4, 6.3, 5.1
    nS, nL = 52, 70      # non-multiple of SBK=8 / LBK=128
    ref = warp_image_to_grid(img, Bmat, H, W, a0, b0, da, db, nS, nL,
                             mxu=False)
    out = warp_image_to_grid_pallas(img, Bmat, H, W, a0, b0, da, db,
                                    nS, nL, interpret=True)
    # value path: bf16 hi/lo split reconstructs f32 to ~4e-6 relative;
    # selection flips (half-integer rounding boundaries) are measure-zero
    ref, out = np.asarray(ref), np.asarray(out)
    flips = np.mean(np.abs(ref - out) > 1e-3)
    assert flips < 2e-3, f"selection flip fraction {flips}"
    keep = np.abs(ref - out) <= 1e-3
    np.testing.assert_allclose(out[keep], ref[keep], rtol=5e-5,
                               atol=1e-5)


@pytest.mark.parametrize("SB,LB", [(64, 128), (52, 100)])
def test_select_grid_at_pixels_parity(SB, LB):
    """Clip-only warp-back: out-of-grid pixels must clamp to the true
    grid edge (NOT read alignment-padding zeros)."""
    H, W = 60, 100
    grid = _rand_img(SB, LB, seed=3)
    # B coords chosen so part of the image maps outside the grid window
    # -> exercises clamping at all four edges. Irrational-ish entries:
    # round numbers put many pixels EXACTLY on cell boundaries, where
    # the composed-homography and two-step formulations legitimately
    # floor to different cells.
    Binv = jnp.asarray(np.array(
        [[0.0201317, 0.0010071, -0.3013717],
         [0.0008093, 0.0251893, -0.2041477],
         [0.0, 0.0, 1.0]], np.float32))
    a0, b0, da, db = 0.0137, 0.0071, 1.10713, 0.90317

    # XLA reference formula (ops/raycast_sweep.py:181-185)
    f32 = jnp.float32
    ys = jnp.arange(H, dtype=f32)
    xs = jnp.arange(W, dtype=f32)
    pix = jnp.stack([jnp.broadcast_to(xs[None, :], (H, W)),
                     jnp.broadcast_to(ys[:, None], (H, W)),
                     jnp.ones((H, W), f32)], axis=0)
    q = jnp.einsum("ij,jhw->ihw", Binv, pix)
    qw = jnp.where(jnp.abs(q[2]) < 1e-12, 1e-12, q[2])
    ja = jnp.clip(jnp.floor((q[0] / qw - a0) / da * LB), 0, LB - 1)
    ib = jnp.clip(jnp.floor((q[1] / qw - b0) / db * SB), 0, SB - 1)
    flat = (ib * LB + ja).astype(jnp.int32)
    ref = jnp.take(grid.reshape(-1), flat)

    out = select_grid_at_pixels_pallas(grid, Binv, a0, b0, da, db,
                                       H, W, interpret=True)
    ref, out = np.asarray(ref), np.asarray(out)
    flips = np.mean(np.abs(ref - out) > 1e-3)
    assert flips < 2e-3, f"selection flip fraction {flips}"
    keep = np.abs(ref - out) <= 1e-3
    np.testing.assert_allclose(out[keep], ref[keep], rtol=5e-5,
                               atol=1e-5)
    # padding-zero reads would show as exact zeros where ref is >= 0.5
    assert out.min() > 0.0
