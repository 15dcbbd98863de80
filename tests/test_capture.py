"""Capture-cache sampler (geometry/capture.py) vs the direct gather
samplers, and the capture-backed LM tracking path."""

import numpy as np
import jax.numpy as jnp

from emfusion_tpu.geometry import se3_exp, pose_inverse
from emfusion_tpu.geometry.capture import (
    capture_neighborhoods, drift_ok, sample_system_from_cache,
    sample_value_from_cache,
)
from emfusion_tpu.geometry.sampling import (
    sample_system_at_points, sample_volume_at_points,
)
from emfusion_tpu.tracking import TrackConfig, track_volume
from tests.test_raycast import sphere_volume
from tests.test_tracking import surface_points_cam


def _random_setup(seed=0, n=500, res=24, voxel=0.1):
    rng = np.random.RandomState(seed)
    vol = rng.randn(res, res, res).astype(np.float32)
    wvol = rng.rand(res, res, res).astype(np.float32) * 5
    # points spanning inside and (some) outside the volume
    pts = rng.uniform(-1.6, 1.6, size=(3, n)).astype(np.float32)
    pts[2] = np.abs(pts[2]) + 0.05          # camera-space z > 0
    th = 0.1
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]], np.float32)
    t = np.array([0.05, -0.1, -1.2], np.float32)
    return vol, wvol, pts, R, t


def test_capture_matches_gather_at_capture_pose():
    vol, wvol, pts, R, t = _random_setup()
    voxel = 0.1
    vols = jnp.stack([jnp.asarray(vol), jnp.asarray(wvol)])
    cache, anchor = capture_neighborhoods(vols, jnp.asarray(pts),
                                          jnp.asarray(R), jnp.asarray(t),
                                          voxel)
    psi_c, g3_c = sample_system_from_cache(
        cache[0], anchor, jnp.asarray(pts), jnp.asarray(R),
        jnp.asarray(t), voxel, vol.shape)
    psi_g, g3_g = sample_system_at_points(
        jnp.asarray(vol), jnp.asarray(pts), jnp.asarray(R),
        jnp.asarray(t), voxel)
    np.testing.assert_allclose(np.asarray(psi_c), np.asarray(psi_g),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g3_c), np.asarray(g3_g),
                               atol=2e-4)

    w_c = sample_value_from_cache(cache[1:2], anchor, jnp.asarray(pts),
                                  jnp.asarray(R), jnp.asarray(t), voxel,
                                  vol.shape, margin=1)[0]
    w_g = sample_volume_at_points(jnp.asarray(wvol), jnp.asarray(pts),
                                  jnp.asarray(R), jnp.asarray(t), voxel,
                                  margin=1)
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_g),
                               atol=2e-5)


def test_capture_matches_gather_within_drift_margin():
    vol, wvol, pts, R, t = _random_setup(seed=3)
    voxel = 0.1
    vols = jnp.stack([jnp.asarray(vol), jnp.asarray(wvol)])
    cache, anchor = capture_neighborhoods(vols, jnp.asarray(pts),
                                          jnp.asarray(R), jnp.asarray(t),
                                          voxel)
    # drift the pose by ~0.6 voxel — inside the -2/+1 window margins
    t2 = t + np.array([0.04, -0.03, 0.03], np.float32)
    ok = drift_ok(anchor, jnp.asarray(pts), jnp.asarray(R),
                  jnp.asarray(t2), voxel, vol.shape)
    assert bool(ok)
    psi_c, g3_c = sample_system_from_cache(
        cache[0], anchor, jnp.asarray(pts), jnp.asarray(R),
        jnp.asarray(t2), voxel, vol.shape)
    psi_g, g3_g = sample_system_at_points(
        jnp.asarray(vol), jnp.asarray(pts), jnp.asarray(R),
        jnp.asarray(t2), voxel)
    np.testing.assert_allclose(np.asarray(psi_c), np.asarray(psi_g),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g3_c), np.asarray(g3_g),
                               atol=2e-4)


def test_drift_triggers_beyond_margin():
    vol, wvol, pts, R, t = _random_setup(seed=4)
    voxel = 0.1
    vols = jnp.stack([jnp.asarray(vol), jnp.asarray(wvol)])
    _, anchor = capture_neighborhoods(vols, jnp.asarray(pts),
                                      jnp.asarray(R), jnp.asarray(t),
                                      voxel)
    t2 = t + np.array([0.35, 0.0, 0.0], np.float32)   # 3.5 voxels
    ok = drift_ok(anchor, jnp.asarray(pts), jnp.asarray(R),
                  jnp.asarray(t2), voxel, vol.shape)
    assert not bool(ok)


def test_lm_capture_matches_gather_trajectory():
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    pts = surface_points_cam(gt, radius)
    xi = jnp.array([0.02, -0.03, 0.04, 0.02, -0.01, 0.015])
    init = np.asarray(se3_exp(xi)) @ gt

    poses = {}
    for sampler in ("gather", "capture"):
        cfg = TrackConfig(max_iter=50, sampler=sampler)
        pose, stats = track_volume(
            jnp.asarray(tsdf), jnp.asarray(weights), voxel,
            jnp.asarray(pts.T), jnp.ones(len(pts)), jnp.asarray(init),
            cfg)
        poses[sampler] = np.asarray(pose)
    # same center estimate (rotation about a sphere center is gauge)
    c_g = np.asarray(pose_inverse(jnp.asarray(poses["gather"])))[:3, 3]
    c_c = np.asarray(pose_inverse(jnp.asarray(poses["capture"])))[:3, 3]
    np.testing.assert_allclose(c_c, c_g, atol=1e-3)
    c_gt = np.asarray(pose_inverse(jnp.asarray(gt)))[:3, 3]
    assert np.linalg.norm(c_c - c_gt) < 0.5 * voxel


def test_lm_capture_recaptures_on_large_motion():
    """An initial error of several voxels forces re-captures and still
    converges to the ground truth."""
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    pts = surface_points_cam(gt, radius)
    init = gt.copy()
    init[0, 3] += 4.2 * voxel          # 4+ voxels off
    init[1, 3] -= 3.6 * voxel

    cfg = TrackConfig(max_iter=80, sampler="capture")
    pose, stats = track_volume(
        jnp.asarray(tsdf), jnp.asarray(weights), voxel,
        jnp.asarray(pts.T), jnp.ones(len(pts)), jnp.asarray(init), cfg)
    assert int(stats["recaptures"]) >= 1
    c_est = np.asarray(pose_inverse(jnp.asarray(pose)))[:3, 3]
    c_gt = np.asarray(pose_inverse(jnp.asarray(gt)))[:3, 3]
    assert np.linalg.norm(c_est - c_gt) < 0.5 * voxel


def test_lm_capture_inactive_returns_init():
    res, voxel, trunc = 16, 0.1, 0.5
    tsdf, weights = sphere_volume(res, voxel, 0.4, trunc)
    init = np.eye(4, dtype=np.float32)
    init[2, 3] = -1.0
    pts = np.array([[0.0, 0.0, 0.6]], np.float32)
    pose, stats = track_volume(
        jnp.asarray(tsdf), jnp.asarray(weights), voxel,
        jnp.asarray(pts.T), jnp.ones(1), jnp.asarray(init),
        TrackConfig(max_iter=10, sampler="capture"), active=False)
    np.testing.assert_allclose(np.asarray(pose), init, atol=1e-6)
