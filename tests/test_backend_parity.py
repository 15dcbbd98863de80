"""TPU-backend parity: the pencil fusion + sweep raycast pipeline must
produce (nearly) the same trajectory as the exact gather/march pipeline.

This is the e2e guard for the TPU-only code paths, runnable on CPU.
"""

import dataclasses

import numpy as np
import pytest

from emfusion_tpu.config import Params
from emfusion_tpu.pipeline import EMFusionPipeline
from synthetic import SyntheticScene


@pytest.fixture(scope="module")
def frames():
    scene = SyntheticScene(H=96, W=128, f=96.0)
    out = []
    for i in range(6):
        cam = np.eye(4, dtype=np.float32)
        cam[0, 3] = 0.006 * i
        cam[1, 3] = -0.003 * i
        depth, _ = scene.render(cam, np.array([0.1, 0.0, 1.2]))
        out.append((depth, cam.copy()))
    return scene, out


def _params(scene, **over):
    base = dict(
        frameSize=(scene.W, scene.H), fx=scene.f, fy=scene.f,
        cx=scene.W / 2 - 0.5, cy=scene.H / 2 - 0.5,
        globalVolumeDims=(64, 64, 64), globalVoxelSize=2.56 / 64,
        volumePose=(0.0, 0.0, 1.6), objVolumeDims=(16, 16, 16),
        maxTrackingIter=20, raycast_max_steps=256, max_objects=4,
        maskRCNNFrames=1000)
    base.update(over)
    return Params(**base)


def _run(scene, frames, **over):
    pipe = EMFusionPipeline(_params(scene, **over), None)
    for depth, _ in frames:
        pipe.process_frame(None, depth)
    return pipe


def test_pencil_sweep_matches_reference_backends(frames):
    scene, seq = frames
    ref = _run(scene, seq, fusion_backend="gather",
               raycast_backend="march")
    tpu = _run(scene, seq, fusion_backend="pencil",
               raycast_backend="sweep")

    # trajectories agree to sub-voxel
    for f in ref.poses:
        dt = np.linalg.norm(ref.poses[f][:3, 3] - tpu.poses[f][:3, 3])
        assert dt < 0.02, (f, dt)

    # fused volumes agree except at a small fraction of band-edge voxels
    a = np.asarray(ref.state.bg_tsdf)
    b = np.asarray(tpu.state.bg_tsdf)
    frac = (np.abs(a - b) > 0.1).mean()
    assert frac < 0.02, frac


def test_pencil_sweep_bf16_close(frames):
    scene, seq = frames
    f32 = _run(scene, seq, fusion_backend="pencil",
               raycast_backend="sweep", matmul_bf16=False)
    bf = _run(scene, seq, fusion_backend="pencil",
              raycast_backend="sweep", matmul_bf16=True)
    for f in f32.poses:
        dt = np.linalg.norm(f32.poses[f][:3, 3] - bf.poses[f][:3, 3])
        assert dt < 0.005, (f, dt)


def test_pallas_fusion_backend_matches_pencil(frames):
    """The production TPU fusion backend (Pallas slice kernel, interpret
    mode on CPU) must track like the XLA pencil path, with bf16 volume
    storage enabled (the full TPU production combination)."""
    scene, seq = frames
    pencil = _run(scene, seq, fusion_backend="pencil",
                  raycast_backend="sweep")
    pallas = _run(scene, seq, fusion_backend="pallas",
                  raycast_backend="sweep", volume_dtype="bfloat16")
    for f in pencil.poses:
        dt = np.linalg.norm(pencil.poses[f][:3, 3]
                            - pallas.poses[f][:3, 3])
        assert dt < 0.005, (f, dt)
    a = np.asarray(pencil.state.bg_tsdf)
    b = np.asarray(pallas.state.bg_tsdf, np.float32)
    frac = (np.abs(a - b) > 0.1).mean()
    assert frac < 0.02, frac
