"""Parity tests for the Pallas B-space sweep kernel (interpret mode).

The Pallas sweep must reproduce the XLA sweep raycast
(``ops/raycast_sweep.py``) up to bf16 resampling noise, and its fused
along-ray point sample must track the exact trilinear E-step sample
(``geometry.sampling.sample_volume_at_points``) within the sweep's
documented deviation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from emfusion_tpu.ops.raycast_sweep import raycast_sweep
from emfusion_tpu.ops.pallas.sweep_pallas import (
    raycast_sweep_pallas, sweep_sample_psi_pallas)
from emfusion_tpu.geometry.sampling import sample_volume_at_points


def _sphere_tsdf(R, voxel, rad, trunc):
    idx = np.arange(R, dtype=np.float32) - (R - 1) / 2
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    d = np.sqrt(xx**2 + yy**2 + zz**2) * voxel - rad
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    weights = (np.abs(d) < 3 * trunc).astype(np.float32) * 10
    return tsdf, weights


@pytest.fixture(scope="module")
def scene():
    R = 48
    H, W = 48, 64
    voxel = 1.2 / R
    trunc = 5 * voxel
    tsdf, weights = _sphere_tsdf(R, voxel, 0.35, trunc)
    intr = jnp.asarray(np.array(
        [[60.0, 0, W / 2 - 0.5], [0, 60.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    th = np.deg2rad(8)
    Rm = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    tv = jnp.asarray(np.array([0.02, -0.03, -1.1], np.float32))
    return dict(tsdf=jnp.asarray(tsdf), weights=jnp.asarray(weights),
                intr=intr, Rm=Rm, tv=tv, voxel=voxel, trunc=trunc,
                H=H, W=W)


def test_raycast_parity(scene):
    s = scene
    ref = raycast_sweep(s["tsdf"], s["weights"], s["Rm"], s["tv"],
                        s["intr"], s["voxel"], s["trunc"], s["H"], s["W"])
    out = raycast_sweep_pallas(s["tsdf"], s["weights"], s["Rm"], s["tv"],
                               s["intr"], s["voxel"], s["trunc"],
                               s["H"], s["W"], interpret=True)
    m_ref = np.asarray(ref["mask"])
    m_out = np.asarray(out["mask"])
    assert m_ref.sum() > 200          # the sphere is visible
    # masks agree except bf16-boundary flips
    assert (m_ref != m_out).mean() < 0.02
    both = m_ref & m_out
    dr = np.abs(np.asarray(ref["raylengths"]) -
                np.asarray(out["raylengths"]))[both]
    assert np.median(dr) < 0.25 * s["voxel"]
    assert np.quantile(dr, 0.98) < 1.5 * s["voxel"]
    # vertices follow raylengths
    dv = np.abs(np.asarray(ref["vertices"]) -
                np.asarray(out["vertices"]))[:, both]
    assert np.quantile(dv, 0.98) < 2 * s["voxel"]


def test_raycast_axis_relabel(scene):
    s = scene
    # looking along volume x: axis=0 path
    Rm = jnp.asarray(np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]],
                              np.float32))
    tv = jnp.asarray(np.array([-1.1, 0.0, 0.0], np.float32))
    ref = raycast_sweep(s["tsdf"], s["weights"], Rm, tv, s["intr"],
                        s["voxel"], s["trunc"], s["H"], s["W"], axis=0)
    out = raycast_sweep_pallas(s["tsdf"], s["weights"], Rm, tv,
                               s["intr"], s["voxel"], s["trunc"],
                               s["H"], s["W"], axis=0, interpret=True)
    m_ref = np.asarray(ref["mask"])
    m_out = np.asarray(out["mask"])
    assert m_ref.sum() > 200
    assert (m_ref != m_out).mean() < 0.02


def _points_from_depth(depth, intr):
    H, W = depth.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    fx, fy = float(intr[0, 0]), float(intr[1, 1])
    cx, cy = float(intr[0, 2]), float(intr[1, 2])
    return np.stack([(xs - cx) / fx * depth, (ys - cy) / fy * depth,
                     depth], 0).astype(np.float32)


def test_point_sample_parity(scene):
    s = scene
    # points on a plausible surface-ish depth map (in front of sphere)
    H, W = s["H"], s["W"]
    ys, xs = np.mgrid[0:H, 0:W]
    depth = (1.05 + 0.05 * np.sin(xs / 5.0) * np.cos(ys / 4.0)
             ).astype(np.float32)
    pts = jnp.asarray(_points_from_depth(depth, np.asarray(s["intr"])))

    psi_sweep = sweep_sample_psi_pallas(
        s["tsdf"], pts, s["Rm"], s["tv"], s["intr"], s["voxel"],
        interpret=True)
    psi_exact = sample_volume_at_points(
        s["tsdf"], pts.reshape(3, -1), s["Rm"], s["tv"], s["voxel"],
        margin=1).reshape(H, W)

    sw = np.asarray(psi_sweep)
    ex = np.asarray(psi_exact)
    valid = (ex != 0.0) & (sw != 0.0)
    assert valid.mean() > 0.5
    err = np.abs(sw - ex)[valid]
    assert np.median(err) < 0.03          # truncated-units
    assert np.quantile(err, 0.95) < 0.12
    # validity agreement away from volume boundary effects
    assert ((ex != 0) != (sw != 0)).mean() < 0.08


def test_point_sample_fused_with_raycast(scene):
    s = scene
    H, W = s["H"], s["W"]
    ys, xs = np.mgrid[0:H, 0:W]
    depth = (1.05 + 0.05 * np.sin(xs / 5.0) * np.cos(ys / 4.0)
             ).astype(np.float32)
    pts = jnp.asarray(_points_from_depth(depth, np.asarray(s["intr"])))
    out = raycast_sweep_pallas(s["tsdf"], s["weights"], s["Rm"], s["tv"],
                               s["intr"], s["voxel"], s["trunc"],
                               H, W, points_cam=pts, interpret=True)
    solo = sweep_sample_psi_pallas(
        s["tsdf"], pts, s["Rm"], s["tv"], s["intr"], s["voxel"],
        interpret=True)
    # the fused point-sample equals the standalone one
    np.testing.assert_allclose(np.asarray(out["psi_pt"]),
                               np.asarray(solo), atol=1e-5)
