"""CI pin for the r3 bench-scene object-loss regression (VERDICT r3
weak #1 / item 1): a receding object whose pre-spawn surface was burned
into the background at frame-0 association weight 1 must NOT be deleted
by the visibility check.

Mechanism (bisected r4): the background keeps a stale imprint of the
object's frame-0 surface; as the object recedes, the imprint's raycast
hit becomes >5 cm nearer than the object's, the compositor's bg
override blanks the object's segmentation pixel by pixel, and the
visibility threshold deletes a perfectly-tracked object. Fixed by
``Params.bg_carve_dist`` free-space carving (ops/fusion.py); this test
runs the TPU-production backend stack (band capture, sweep raycast,
pencil fusion, stride 3, escale 2) on CPU and asserts survival.
"""

import numpy as np

from emfusion_tpu.config import Params
from emfusion_tpu.pipeline import EMFusionPipeline
from emfusion_tpu.segmentation import (CallableMaskProvider, Detection,
                                       make_score_vector)
from tests.synthetic import SyntheticScene


def _run_scene(n_frames=14, res=128, **param_overrides):
    H, W = 480, 640
    vol_m = 5.12
    voxel = vol_m / res
    scene = SyntheticScene(
        H=H, W=W, f=525.0, floor_y=0.8,
        bg_spheres=((np.array([-0.6, 0.0, 2.0]), 0.55),
                    (np.array([0.7, -0.5, 2.4]), 0.4)),
        obj_sphere_r=0.18)
    params = Params(globalVolumeDims=(res, res, res),
                    globalVoxelSize=voxel,
                    volumePose=(0.0, 0.0, vol_m / 2),
                    # TPU-production backend stack, CPU-runnable
                    capture_backend="band", estep_backend="gather",
                    raycast_backend="sweep", fusion_backend="pencil",
                    tracking_stride=3, estep_scale=2,
                    **param_overrides)
    masks = {}

    def provider(rgb, frame):
        if frame not in masks:
            return []
        return [Detection(mask=masks[frame],
                          scores=make_score_vector(3, 0.9))]

    pipe = EMFusionPipeline(params, CallableMaskProvider(provider))
    for f in range(n_frames):
        th = 0.004 * f
        c, s = np.cos(th), np.sin(th)
        cam = np.array([[c, 0, s, 0.01 * f], [0, 1, 0, -0.005 * f],
                        [-s, 0, c, 0.002 * f], [0, 0, 0, 1]],
                       np.float32)
        depth, mask = scene.render(
            cam, np.array([0.55, 0.25, 1.6 + 0.01 * f]))
        masks[f] = mask
        pipe.process_frame(None, depth)
    pipe.flush()
    return pipe


def test_receding_object_survives_production_stack():
    pipe = _run_scene()
    assert len(pipe.active_object_ids) == 1, (
        "bench-scene object deleted mid-run — stale-background carving "
        "(Params.bg_carve_dist) regressed")
    # and it is genuinely visible, not just barely surviving
    st = pipe.last_frame_stats
    k = int(np.argmax(pipe._h_ids > 0))
    assert st["vis_counts"][k] > pipe.params.visibilityThresh
