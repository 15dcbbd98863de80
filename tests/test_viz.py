"""Detection overlay + turntable rendering (viz.py)."""

import numpy as np

from emfusion_tpu.segmentation import Detection, make_score_vector
from emfusion_tpu.viz import render_turntable, visualize_detections


def test_visualize_detections_overlay():
    H, W = 60, 80
    rgb = np.full((H, W, 3), 40, np.uint8)
    m1 = np.zeros((H, W), bool)
    m1[10:30, 10:40] = True
    m2 = np.zeros((H, W), bool)
    m2[35:55, 45:75] = True
    dets = [Detection(mask=m1, scores=make_score_vector(3, 0.9)),
            Detection(mask=m2, scores=make_score_vector(57, 0.8),
                      box=np.array([35, 45, 54, 74]))]
    vis = visualize_detections(rgb, dets)
    assert vis.shape == (H, W, 3) and vis.dtype == np.uint8
    # masked regions are tinted (changed from the background gray)
    assert (vis[15, 20] != rgb[15, 20]).any()
    assert (vis[45, 60] != rgb[45, 60]).any()
    # region away from masks/boxes/labels unchanged
    assert (vis[58, 5] == rgb[58, 5]).all()
    # rgb=None path
    vis2 = visualize_detections(None, dets)
    assert vis2.shape == (H, W, 3)


def test_turntable_renders_scene(tmp_path):
    import jax.numpy as jnp
    from emfusion_tpu.config import Params
    from emfusion_tpu.pipeline import EMFusionPipeline
    from synthetic import SyntheticScene

    scene = SyntheticScene(H=48, W=64, f=48.0)
    params = Params(
        frameSize=(scene.W, scene.H), fx=scene.f, fy=scene.f,
        cx=scene.W / 2 - 0.5, cy=scene.H / 2 - 0.5,
        globalVolumeDims=(48, 48, 48), globalVoxelSize=2.4 / 48,
        volumePose=(0.0, 0.0, 1.2), objVolumeDims=(16, 16, 16),
        maxTrackingIter=5, raycast_max_steps=128, max_objects=4,
        maskRCNNFrames=1000)
    pipe = EMFusionPipeline(params, None)
    depth, _ = scene.render(np.eye(4, dtype=np.float32),
                            np.array([9.0, 9.0, 9.0]))
    for _ in range(2):
        pipe.process_frame(None, depth)

    frames = render_turntable(pipe, n_views=3)
    assert len(frames) == 3
    lit = [int((f.sum(-1) > 0).sum()) for f in frames]
    # the fused spheres/floor are visible from most orbit views
    assert max(lit) > 100, lit

    from emfusion_tpu.viz import save_frames
    save_frames(frames, str(tmp_path / "v%03d.png"))
    assert (tmp_path / "v000.png").exists()
