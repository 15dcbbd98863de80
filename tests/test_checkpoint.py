"""Checkpoint/resume: a resumed pipeline must continue bit-identically."""

import numpy as np

from emfusion_tpu.checkpoint import load_checkpoint, save_checkpoint
from emfusion_tpu.config import Params
from emfusion_tpu.pipeline import EMFusionPipeline
from synthetic import SyntheticScene


def _params(scene):
    return Params(
        frameSize=(scene.W, scene.H), fx=scene.f, fy=scene.f,
        cx=scene.W / 2 - 0.5, cy=scene.H / 2 - 0.5,
        globalVolumeDims=(48, 48, 48), globalVoxelSize=2.4 / 48,
        volumePose=(0.0, 0.0, 1.6), objVolumeDims=(16, 16, 16),
        maxTrackingIter=10, raycast_max_steps=128, max_objects=4,
        maskRCNNFrames=1000)


def test_checkpoint_roundtrip(tmp_path):
    scene = SyntheticScene(H=60, W=80, f=60.0)
    params = _params(scene)

    pipe = EMFusionPipeline(params, None)
    frames = []
    for i in range(6):
        cam = np.eye(4, dtype=np.float32)
        cam[0, 3] = 0.005 * i
        depth, _ = scene.render(cam, np.array([0.1, 0.0, 1.2]))
        frames.append(depth)

    for i in range(3):
        pipe.process_frame(None, frames[i], timestamp=i * 0.1)

    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(pipe, ckpt)

    # continue original
    for i in range(3, 6):
        pipe.process_frame(None, frames[i], timestamp=i * 0.1)

    # resume into a fresh pipeline
    pipe2 = EMFusionPipeline(params, None)
    load_checkpoint(pipe2, ckpt)
    assert pipe2.frame == 3
    assert pipe2.timestamps[2] == 0.2
    for i in range(3, 6):
        pipe2.process_frame(None, frames[i], timestamp=i * 0.1)

    np.testing.assert_allclose(np.asarray(pipe2.state.cam_pose),
                               np.asarray(pipe.state.cam_pose),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pipe2.state.bg_tsdf),
                               np.asarray(pipe.state.bg_tsdf), atol=1e-6)
    assert set(pipe2.poses) == set(pipe.poses)


def test_checkpoint_shape_mismatch(tmp_path):
    scene = SyntheticScene(H=60, W=80, f=60.0)
    pipe = EMFusionPipeline(_params(scene), None)
    depth, _ = scene.render(np.eye(4, dtype=np.float32),
                            np.array([0.1, 0.0, 1.2]))
    pipe.process_frame(None, depth)
    ckpt = str(tmp_path / "s.npz")
    save_checkpoint(pipe, ckpt)

    p2 = _params(scene)
    p2.globalVolumeDims = (32, 32, 32)
    pipe2 = EMFusionPipeline(p2, None)
    try:
        load_checkpoint(pipe2, ckpt)
        raise AssertionError("expected shape mismatch error")
    except ValueError as e:
        assert "shape mismatch" in str(e)
