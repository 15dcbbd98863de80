"""Pencil (MXU-matmul) fusion vs the direct-gather jnp reference.

The pencil path reproduces the reference's nearest-pixel lookup up to the
reference-plane grid quantization (sub-pixel at 1.5x oversampling), so on
piecewise-smooth depth the fused volumes must agree except at a small
fraction of depth-discontinuity voxels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from emfusion_tpu.ops.fusion import integrate_tsdf
from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil


def _smooth_depth(rng, H, W):
    ys, xs = np.mgrid[0:H, 0:W]
    d = 1.2 + 0.25 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
    return d.astype(np.float32)


def _setup(rng, R=(24, 20, 32), H=30, W=40):
    Z, Y, X = R
    voxel = 2.0 / max(R)
    trunc = 5 * voxel
    intr = jnp.asarray(np.array(
        [[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    depth = _smooth_depth(rng, H, W)
    assoc = (0.5 + 0.5 * np.cos(np.mgrid[0:H, 0:W][1] / 11.0)).astype(
        np.float32)
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


@pytest.mark.parametrize("axis,deg,tz", [
    ("z", 0, 1.2), ("z", 30, 1.3), ("x", 20, 1.3), ("y", 25, 1.4),
    ("z", 90, 1.5), ("x", 45, 1.6),
])
def test_pencil_matches_reference(rng, axis, deg, tz):
    tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
    rot = jnp.asarray(_rot(axis, deg))
    tr = jnp.asarray(np.array([0.02, -0.03, tz], np.float32))
    t_ref, w_ref = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                                  voxel, trunc, 64.0)
    t_pen, w_pen = integrate_tsdf_pencil(tsdf, w, depth, assoc, rot, tr,
                                         intr, voxel, trunc, 64.0,
                                         oversample=2.0)
    # smooth depth: value errors stay small where both updated; a small
    # fraction of voxels may round to a different pixel near mask edges
    dt = np.abs(np.asarray(t_pen) - np.asarray(t_ref))
    frac_large = (dt > 0.05).mean()
    assert frac_large < 0.015, f"large-diff fraction {frac_large:.4f}"
    assert np.median(dt) < 1e-3


def test_pencil_convergence_to_surface(rng):
    """Repeated fusion of a constant smooth depth map must produce a
    near-zero TSDF at the observed surface (absolute correctness check,
    not just parity)."""
    Z = Y = X = 48
    voxel = 2.4 / 48
    trunc = 5 * voxel
    H, W = 60, 80
    f = 60.0
    intr = jnp.asarray(np.array(
        [[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1]], np.float32))
    depth = jnp.asarray(_smooth_depth(rng, H, W))
    assoc = jnp.ones((H, W), jnp.float32)
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0, 0, 1.2], np.float32))
    tsdf = jnp.zeros((Z, Y, X))
    wts = jnp.zeros((Z, Y, X))
    for _ in range(3):
        tsdf, wts = integrate_tsdf_pencil(tsdf, wts, depth, assoc, rot, tr,
                                          intr, voxel, trunc, 64.0)
    # sample the TSDF along the central pixel ray at the measured depth
    d = float(depth[H // 2, W // 2])
    # voxel containing the surface point (camera at volume center frame):
    # cam = (0, 0, d) -> voxel z = d/voxel - ... (volume centered at tr)
    zi = int(round((d - float(tr[2])) / voxel + (Z - 1) / 2.0))
    yi = (Y - 1) // 2
    xi = (X - 1) // 2
    band = np.asarray(tsdf[zi - 1:zi + 2, yi, xi])
    assert np.min(np.abs(band)) < 0.35, band
    # free space in front of the surface must be positive
    assert float(tsdf[zi - 3, yi, xi]) > 0.4


def test_pencil_scan_axis_pitched_camera(rng):
    """Camera looking along volume +x: the default z scan degrades to
    grazing slices, the relabeled scan (axis from pick_scan_axis) must
    match the exact gather reference."""
    from emfusion_tpu.ops.fusion_pencil import pick_scan_axis

    tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
    rot = jnp.asarray(_rot("y", -90))   # vol x -> cam z
    tr = jnp.asarray(np.array([0.01, -0.02, 1.3], np.float32))
    # pick_scan_axis wants camera->object: R_co = R_oc^T
    ax = pick_scan_axis(np.asarray(rot).T)
    assert ax == 0

    t_ref, w_ref = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                                  voxel, trunc, 64.0)
    t_pen, _ = integrate_tsdf_pencil(tsdf, w, depth, assoc, rot, tr,
                                     intr, voxel, trunc, 64.0,
                                     oversample=2.0, axis=ax)
    dt = np.abs(np.asarray(t_pen) - np.asarray(t_ref))
    frac_large = (dt > 0.05).mean()
    assert frac_large < 0.015, f"large-diff fraction {frac_large:.4f}"
    assert np.median(dt) < 1e-3


def test_pencil_scan_axis_y(rng):
    """Same for a camera looking along volume -y (axis 1)."""
    from emfusion_tpu.ops.fusion_pencil import pick_scan_axis

    tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
    rot = jnp.asarray(_rot("x", -90))   # vol -y -> cam z
    tr = jnp.asarray(np.array([0.01, 0.02, 1.3], np.float32))
    ax = pick_scan_axis(np.asarray(rot).T)
    assert ax == 1

    t_ref, _ = integrate_tsdf(tsdf, w, depth, assoc, rot, tr, intr,
                              voxel, trunc, 64.0)
    t_pen, _ = integrate_tsdf_pencil(tsdf, w, depth, assoc, rot, tr,
                                     intr, voxel, trunc, 64.0,
                                     oversample=2.0, axis=ax)
    dt = np.abs(np.asarray(t_pen) - np.asarray(t_ref))
    assert (dt > 0.05).mean() < 0.015
    assert np.median(dt) < 1e-3


@pytest.mark.parametrize("axis,deg,tz", [
    ("z", 0, 1.2), ("x", 20, 1.3), ("z", 90, 1.5),
    # camera inside the volume: some slices behind it (skip rung)
    ("z", 10, 0.3),
])
def test_windowed_matches_full(rng, axis, deg, tz):
    """The per-slice B-window ladder must be numerically identical to the
    full-grid matmul gather (same one-hot selections, same values)."""
    tsdf, w, depth, assoc, intr, voxel, trunc = _setup(rng)
    rot = jnp.asarray(_rot(axis, deg))
    tr = jnp.asarray(np.array([0.02, -0.03, tz], np.float32))
    t_full, w_full = integrate_tsdf_pencil(tsdf, w, depth, assoc, rot, tr,
                                           intr, voxel, trunc, 64.0,
                                           windowed=False)
    t_win, w_win = integrate_tsdf_pencil(tsdf, w, depth, assoc, rot, tr,
                                         intr, voxel, trunc, 64.0,
                                         windowed=True)
    np.testing.assert_array_equal(np.asarray(t_win), np.asarray(t_full))
    np.testing.assert_array_equal(np.asarray(w_win), np.asarray(w_full))


def test_warp_mxu_matches_gather():
    """select_pixels_mxu / warp_image_to_grid(mxu=True) must reproduce
    the plain-gather warp: f32 chain exactly, bf16 hi/lo to ~4e-6
    relative (lo-rounding of the split)."""
    import numpy as np
    from emfusion_tpu.ops.fusion_pencil import warp_image_to_grid

    rng = np.random.RandomState(0)
    H, W = 120, 160
    img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 3.0)
    for th_deg in (5.0, 40.0):
        th = np.deg2rad(th_deg)
        c, s = np.cos(th), np.sin(th)
        Bmat = jnp.asarray(np.array(
            [[130.0 * c, -130.0 * s, 80.0],
             [128.0 * s, 128.0 * c, 60.0],
             [0.02, 0.01, 1.0]], np.float32))
        for nS, nL in ((152, 224), (96, 160)):
            ref = warp_image_to_grid(img, Bmat, H, W, -0.4, -0.35,
                                     0.8, 0.7, nS, nL, mxu=False)
            f32 = warp_image_to_grid(img, Bmat, H, W, -0.4, -0.35,
                                     0.8, 0.7, nS, nL, mxu=True,
                                     bf16=False)
            bf = warp_image_to_grid(img, Bmat, H, W, -0.4, -0.35,
                                    0.8, 0.7, nS, nL, mxu=True,
                                    bf16=True)
            np.testing.assert_array_equal(np.asarray(f32),
                                          np.asarray(ref))
            np.testing.assert_allclose(np.asarray(bf), np.asarray(ref),
                                       atol=3e-5)
