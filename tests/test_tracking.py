import numpy as np
import jax
import jax.numpy as jnp

from emfusion_tpu.geometry import se3_exp, pose_inverse
from emfusion_tpu.ops.fusion import compute_gradients
from emfusion_tpu.tracking import TrackConfig, track_volume
from tests.test_raycast import sphere_volume


def surface_points_cam(gt_rel_co, radius=0.5, n=400, seed=1):
    """Points on the sphere surface, expressed in the camera frame for
    ground-truth camera->object transform gt_rel_co."""
    rng = np.random.RandomState(seed)
    # hemisphere facing the camera (object frame -z side)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = -np.abs(v[:, 2])
    p_obj = v * radius
    T_oc = np.asarray(pose_inverse(jnp.asarray(gt_rel_co)))
    p_cam = p_obj @ T_oc[:3, :3].T + T_oc[:3, 3]
    return p_cam[p_cam[:, 2] > 0.1].astype(np.float32)


def test_lm_converges_to_ground_truth():
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))

    # ground truth: camera 1.2m in front of center
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    pts = surface_points_cam(gt, radius)
    assert len(pts) > 200

    # perturb the initial pose
    xi = jnp.array([0.02, -0.03, 0.04, 0.02, -0.01, 0.015])
    init = np.asarray(se3_exp(xi)) @ gt

    cfg = TrackConfig(max_iter=50)
    pose, stats = track_volume(
        jnp.asarray(tsdf), jnp.asarray(weights), voxel,
        jnp.asarray(pts.T), jnp.ones(len(pts)), jnp.asarray(init), cfg)
    pose = np.asarray(pose)
    # A sphere only pins down its center: compare the sphere-center position
    # in the camera frame (rotation about the center is gauge freedom).
    center_est = np.asarray(pose_inverse(jnp.asarray(pose)))[:3, 3]
    center_gt = np.asarray(pose_inverse(jnp.asarray(gt)))[:3, 3]
    center_init = np.asarray(pose_inverse(jnp.asarray(init)))[:3, 3]
    err = np.linalg.norm(center_est - center_gt)
    init_err = np.linalg.norm(center_init - center_gt)
    assert err < 0.5 * voxel, (center_est, center_gt)
    assert err < 0.3 * init_err


def test_lm_plane_full_pose():
    """Three orthogonal planes pin down all 6 DoF."""
    res, voxel, trunc = 64, 0.05, 0.25
    idx = np.arange(res, dtype=np.float32) - (res - 1) / 2.0
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    # corner: distance to the max of three axis planes at +0.5m
    d = np.maximum.reduce([xx, yy, zz]) * voxel - 0.5
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    weights = np.ones_like(tsdf)
    grads = compute_gradients(jnp.asarray(tsdf))

    rng = np.random.RandomState(3)
    # sample points on the three faces of the corner
    pts_obj = []
    for axis in range(3):
        uv = rng.uniform(-0.4, 0.45, size=(150, 2))
        p = np.zeros((150, 3))
        other = [a for a in range(3) if a != axis]
        p[:, other[0]] = uv[:, 0]
        p[:, other[1]] = uv[:, 1]
        p[:, axis] = 0.5
        pts_obj.append(p)
    pts_obj = np.concatenate(pts_obj).astype(np.float32)

    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.1, -0.15, -1.4]   # camera->object translation
    T_oc = np.asarray(pose_inverse(jnp.asarray(gt)))
    pts_cam = (pts_obj @ T_oc[:3, :3].T + T_oc[:3, 3]).astype(np.float32)
    keep = pts_cam[:, 2] > 0.1
    pts_cam = pts_cam[keep]

    xi = jnp.array([0.03, 0.02, -0.03, 0.02, 0.015, -0.02])
    init = np.asarray(se3_exp(xi)) @ gt

    cfg = TrackConfig(max_iter=80)
    pose, stats = track_volume(
        jnp.asarray(tsdf), jnp.asarray(weights), voxel,
        jnp.asarray(pts_cam.T), jnp.ones(len(pts_cam)), jnp.asarray(init),
        cfg)
    pose = np.asarray(pose)
    np.testing.assert_allclose(pose[:3, 3], gt[:3, 3], atol=0.02)
    np.testing.assert_allclose(pose[:3, :3], gt[:3, :3], atol=0.02)


def test_lm_inactive_returns_init():
    res, voxel, trunc = 16, 0.1, 0.5
    tsdf, weights = sphere_volume(res, voxel, 0.4, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    init = np.eye(4, dtype=np.float32)
    init[2, 3] = -1.0
    pts = np.array([[0.0, 0.0, 0.6]], np.float32)
    pose, stats = track_volume(
        jnp.asarray(tsdf), jnp.asarray(weights), voxel,
        jnp.asarray(pts.T), jnp.ones(1), jnp.asarray(init),
        TrackConfig(max_iter=10), active=False)
    np.testing.assert_allclose(np.asarray(pose), init, atol=1e-6)


def test_lm_vmap_over_objects():
    """Batched tracking over an object pool via vmap."""
    res, voxel, radius, trunc = 32, 0.1, 0.5, 0.5
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = np.asarray(compute_gradients(jnp.asarray(tsdf)))

    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    pts = surface_points_cam(gt, radius)[:256]

    xi = jnp.array([0.02, -0.02, 0.03, 0.0, 0.0, 0.0])
    init_perturbed = np.asarray(se3_exp(xi)) @ gt

    tsdfs = jnp.asarray(np.stack([tsdf, tsdf]))
    gradss = jnp.asarray(np.stack([grads, grads]))
    weightss = jnp.asarray(np.stack([weights, weights]))
    inits = jnp.asarray(np.stack([init_perturbed, init_perturbed]))
    actives = jnp.array([True, False])
    vsizes = jnp.array([voxel, voxel])

    cfg = TrackConfig(max_iter=30)
    fn = jax.vmap(
        lambda t, w, vs, ini, act: track_volume(
            t, w, vs, jnp.asarray(pts.T), jnp.ones(len(pts)), ini, cfg,
            active=act))
    poses, stats = fn(tsdfs, weightss, vsizes, inits, actives)
    poses = np.asarray(poses)
    # lane 0 tracked toward gt; lane 1 untouched
    assert np.linalg.norm(poses[0][:3, 3] - gt[:3, 3]) < \
        0.5 * np.linalg.norm(init_perturbed[:3, 3] - gt[:3, 3])
    np.testing.assert_allclose(poses[1], init_perturbed, atol=1e-6)
