import os

import numpy as np
import jax.numpy as jnp
import pytest

from emfusion_tpu.eval import evaluate_ate, evaluate_rpe, load_trajectory
from emfusion_tpu.eval.ate import align_horn
from emfusion_tpu.geometry import se3_exp
from emfusion_tpu.io.writers import (
    write_pose_file, write_volume_bin, read_volume_bin, add_pose_offsets,
    write_ply,
)
from emfusion_tpu.segmentation import (
    Detection, filter_detections, make_score_vector, save_detections,
    ReplayMaskProvider, CLASS_NAMES,
)


def make_traj(rng, n=50, noise=0.0):
    traj = {}
    for i in range(n):
        xi = np.array([0.01 * i, 0.005 * i, 0.002 * i, 0.001 * i, 0, 0])
        T = np.array(se3_exp(jnp.asarray(xi.astype(np.float32))))
        T[:3, 3] += rng.randn(3) * noise
        traj[float(i)] = T
    return traj


def test_ate_zero_for_identical(rng):
    t = make_traj(rng)
    res = evaluate_ate(t, t)
    assert res["rmse"] < 1e-6


def test_ate_invariant_to_rigid_offset(rng):
    t = make_traj(rng)
    xi = jnp.array([0.5, -0.3, 0.2, 0.3, -0.2, 0.1])
    off = np.asarray(se3_exp(xi))
    t2 = {k: off @ v for k, v in t.items()}
    res = evaluate_ate(t2, t)
    assert res["rmse"] < 1e-5  # Horn alignment removes the rigid offset


def test_ate_measures_noise(rng):
    t = make_traj(rng)
    t_noisy = make_traj(rng, noise=0.02)
    res = evaluate_ate(t_noisy, t)
    assert 0.005 < res["rmse"] < 0.05


def test_rpe(rng):
    t = make_traj(rng)
    res = evaluate_rpe(t, t, delta=1)
    assert res["trans_rmse"] < 1e-6
    t_noisy = make_traj(rng, noise=0.01)
    res2 = evaluate_rpe(t_noisy, t, delta=1)
    assert res2["trans_rmse"] > 0.005


def test_align_horn_recovers_rotation(rng):
    pts = rng.randn(3, 30)
    xi = jnp.array([0.1, 0.2, -0.1, 0.4, -0.3, 0.2])
    T = np.asarray(se3_exp(xi))
    pts2 = T[:3, :3] @ pts + T[:3, 3:]
    rot, trans, err = align_horn(pts, pts2)
    assert err.max() < 1e-5
    np.testing.assert_allclose(rot, T[:3, :3], atol=1e-5)


def test_pose_file_roundtrip(tmp_path, rng):
    t = make_traj(rng, n=10)
    path = str(tmp_path / "poses.txt")
    write_pose_file(path, {int(k): v for k, v in t.items()})
    loaded = load_trajectory(path)
    assert len(loaded) == 10
    for k, T in t.items():
        np.testing.assert_allclose(loaded[float(int(k))], T, atol=1e-5)


def test_add_pose_offsets():
    poses = {0: np.eye(4), 1: np.eye(4), 2: np.eye(4)}
    offsets = {1: np.array([0.1, 0.0, 0.0], np.float32)}
    out = add_pose_offsets(poses, offsets)
    np.testing.assert_allclose(out[0][:3, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1][:3, 3], [-0.1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2][:3, 3], [-0.1, 0, 0], atol=1e-6)


def test_volume_bin_roundtrip(tmp_path, rng):
    vol = rng.rand(4, 5, 6).astype(np.float32)
    path = str(tmp_path / "vol.bin")
    write_volume_bin(path, vol, (6, 5, 4), 0.01)
    data, res, voxel = read_volume_bin(path)
    assert res == (6, 5, 4)
    assert abs(voxel - 0.01) < 1e-7
    np.testing.assert_allclose(data, vol)


def test_write_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    norms = np.tile([0, 0, 1.0], (3, 1))
    tris = np.array([[0, 1, 2]])
    path = str(tmp_path / "mesh.ply")
    write_ply(path, verts, norms, tris)
    text = open(path).read()
    assert "element vertex 3" in text
    assert "element face 1" in text
    assert text.strip().endswith("3 0 1 2")


def test_detection_filtering():
    big = np.zeros((100, 100), bool)
    big[10:90, 10:90] = True
    small = np.zeros((100, 100), bool)
    small[0:5, 0:5] = True
    dets = [
        Detection(mask=big, scores=make_score_vector(
            CLASS_NAMES.index("car"))),
        Detection(mask=big, scores=make_score_vector(
            CLASS_NAMES.index("bench"))),   # static -> dropped
        Detection(mask=small, scores=make_score_vector(
            CLASS_NAMES.index("car"))),      # too small -> dropped
        Detection(mask=big, scores=make_score_vector(
            CLASS_NAMES.index("person"))),
    ]
    out = filter_detections(dets, [], ["bench"], min_pixels=100)
    assert len(out) == 2
    out2 = filter_detections(dets, ["person"], [], min_pixels=100)
    assert len(out2) == 1 and out2[0].class_id == CLASS_NAMES.index("person")


def test_mask_replay_roundtrip(tmp_path):
    m = np.zeros((60, 80), bool)
    m[10:40, 20:60] = True
    det = Detection(mask=m, scores=make_score_vector(3, 0.7),
                    box=np.array([10, 20, 40, 60]))
    save_detections(str(tmp_path / "Mask0000.plk"), [det])
    prov = ReplayMaskProvider(str(tmp_path))
    out = prov.detect(None, 0)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0].mask, m)
    assert out[0].class_id == 3
    assert prov.detect(None, 5) is None
