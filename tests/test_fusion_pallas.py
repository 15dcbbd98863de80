"""Pallas fusion kernel vs the jnp reference implementation.

Runs in interpret mode on CPU; the two-pass warp must match the direct
per-voxel gather exactly for axis-aligned poses, and up to a small
mismatched-voxel fraction for tilted poses (one-pixel u-rounding slack,
see fusion_pallas.py docstring).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from emfusion_tpu.ops.fusion import integrate_tsdf
from emfusion_tpu.ops.pallas.fusion_pallas import integrate_tsdf_pallas


def _setup(rng, R=(24, 20, 32), H=30, W=40):
    Z, Y, X = R
    voxel = 2.0 / max(R)
    trunc = 5 * voxel
    intr = jnp.asarray(np.array(
        [[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    depth = (1.0 + 0.3 * rng.rand(H, W)).astype(np.float32)
    depth[rng.rand(H, W) < 0.05] = 0.0  # invalid holes
    assoc = rng.rand(H, W).astype(np.float32)
    tsdf = (rng.rand(Z, Y, X) * 2 - 1).astype(np.float32)
    weights = (rng.rand(Z, Y, X) * 3).astype(np.float32)
    weights[rng.rand(Z, Y, X) < 0.3] = 0.0
    return (jnp.asarray(tsdf), jnp.asarray(weights), jnp.asarray(depth),
            jnp.asarray(assoc), intr, voxel, trunc)


def _rot(axis, deg):
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestFusionPallas:
    def test_axis_aligned_exact(self, rng):
        tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
        rot = jnp.eye(3)
        tr = jnp.asarray(np.array([0.03, -0.02, 1.2], np.float32))
        t_ref, w_ref = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                                      voxel, trunc, 64.0)
        t_pal, w_pal = integrate_tsdf_pallas(tsdf, w, depth, assoc, rot, tr,
                                             intr, voxel, trunc, 64.0,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_pal), np.asarray(w_ref),
                                   atol=1e-5)

    @pytest.mark.parametrize("axis,deg", [("z", 30), ("x", 15), ("y", 20),
                                          ("x", 40)])
    def test_tilted_near_exact(self, rng, axis, deg):
        tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
        rot = jnp.asarray(_rot(axis, deg))
        tr = jnp.asarray(np.array([0.0, 0.0, 1.3], np.float32))
        t_ref, w_ref = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                                      voxel, trunc, 64.0)
        t_pal, w_pal = integrate_tsdf_pallas(tsdf, w, depth, assoc, rot, tr,
                                             intr, voxel, trunc, 64.0,
                                             interpret=True)
        # voxels whose 2-pass depth lookup landed on a neighboring pixel
        # can differ; require the mismatch fraction to be small
        diff = np.abs(np.asarray(t_pal) - np.asarray(t_ref)) > 1e-4
        frac = diff.mean()
        assert frac < 0.02, f"mismatch fraction {frac:.4f}"

    def test_z_rotation_exact(self, rng):
        # in-plane rotation keeps du/dy... nonzero; but pure z-rotation with
        # identity tilt must still carve/reset consistently
        tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
        rot = jnp.asarray(_rot("z", 90))
        tr = jnp.asarray(np.array([0.0, 0.0, 1.5], np.float32))
        t_ref, _ = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                                  voxel, trunc, 64.0)
        t_pal, _ = integrate_tsdf_pallas(tsdf, w, depth, assoc, rot, tr,
                                         intr, voxel, trunc, 64.0,
                                         interpret=True)
        diff = np.abs(np.asarray(t_pal) - np.asarray(t_ref)) > 1e-4
        assert diff.mean() < 0.02
