"""Integration tests of the full EM pipeline on a synthetic sequence."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from emfusion_tpu.config import Params, TSDFParams
from emfusion_tpu.pipeline import EMFusionPipeline
from emfusion_tpu.segmentation import (
    CallableMaskProvider, Detection, make_score_vector,
)
from tests.synthetic import SyntheticScene


def small_params(**kw):
    p = Params(
        frameSize=(160, 120),
        fx=120.0, fy=120.0, cx=79.5, cy=59.5,
        globalVolumeDims=(96, 96, 96),
        globalVoxelSize=0.03,
        volumePose=(0.0, 0.0, 1.4),
        objVolumeDims=(32, 32, 32),
        maxTrackingIter=30,
        maskRCNNFrames=3,
        visibilityThresh=60,
        mask_min_pixels=60,
        raycast_max_steps=384,
        max_objects=4,
    )
    for k, v in kw.items():
        setattr(p, k, v)
    return p


@pytest.fixture(scope="module")
def pipeline_run():
    """Run 7 frames of a synthetic sequence with a laterally moving object
    sphere; masks provided at frames 0, 3, 6."""
    scene = SyntheticScene()
    obj_centers = {}

    def obj_center(f):
        return np.array([0.22 + 0.015 * f, 0.1, 1.05])

    masks = {}

    def provider_fn(rgb, frame):
        return [Detection(mask=masks[frame],
                          scores=make_score_vector(3, 0.9))]  # class 'car'

    p = small_params()
    pipe = EMFusionPipeline(p, CallableMaskProvider(provider_fn))

    cam = np.eye(4, dtype=np.float32)
    n_frames = 7
    for f in range(n_frames):
        c = obj_center(f)
        obj_centers[f] = c
        depth, mask = scene.render(cam, c)
        masks[f] = mask
        pipe.process_frame(None, depth)
    return pipe, obj_centers, n_frames


def test_camera_stays_put(pipeline_run):
    pipe, _, n = pipeline_run
    # static camera: final pose within a voxel of identity
    final = pipe.poses[n - 1]
    assert np.linalg.norm(final[:3, 3]) < 0.03, final[:3, 3]
    np.testing.assert_allclose(final[:3, :3], np.eye(3), atol=0.02)


def test_object_spawned_and_tracked(pipeline_run):
    pipe, centers, n = pipeline_run
    assert len(pipe.active_object_ids) >= 1, "no object spawned"
    oid = pipe.active_object_ids[0]
    traj = pipe.obj_poses[oid]
    # object pose created near the true center at spawn
    f0 = min(traj.keys())
    spawn_err = np.linalg.norm(traj[f0][:3, 3] - centers[f0])
    assert spawn_err < 0.12, (traj[f0][:3, 3], centers[f0])
    # object tracked: its pose should have moved in +x between first and
    # last frame (true motion is +0.015/frame)
    fl = max(traj.keys())
    dx = traj[fl][0, 3] - traj[f0][0, 3]
    true_dx = centers[fl][0] - centers[f0][0]
    assert dx > 0.3 * true_dx, (dx, true_dx)


def test_object_class_recorded(pipeline_run):
    pipe, _, _ = pipeline_run
    oid = pipe.active_object_ids[0]
    meta = pipe.meta[oid]
    assert meta.class_probs is not None
    assert int(np.argmax(meta.class_probs)) == 3  # 'car'
    assert meta.ex_prob > 0.5


def test_render_output(pipeline_run):
    pipe, _, _ = pipeline_run
    img = pipe.render()
    assert img.shape == (120, 160, 3)
    assert (img.sum(-1) > 0).sum() > 1000  # scene visible


def test_association_separates_object(pipeline_run):
    """Post-track association: object pixels should favor the object
    model over the background."""
    pipe, centers, n = pipeline_run
    oid = pipe.active_object_ids[0]
    slot = pipe._slot_of(oid)
    obj_assoc = np.asarray(pipe.state.objs.assoc[slot])
    bg_assoc = np.asarray(pipe.state.bg_assoc)
    rc = pipe._last_raycast
    seg = np.asarray(rc["seg"])
    obj_px = seg == oid
    if obj_px.sum() > 50:
        assert obj_assoc[obj_px].mean() > bg_assoc[obj_px].mean()


def test_object_deleted_when_gone():
    """Object that disappears (mask gone + not visible) is deleted."""
    scene = SyntheticScene()
    p = small_params()

    masks = {}

    def provider_fn(rgb, frame):
        if frame in masks:
            return [Detection(mask=masks[frame],
                              scores=make_score_vector(3, 0.9))]
        return []

    pipe = EMFusionPipeline(p, CallableMaskProvider(provider_fn))
    cam = np.eye(4, dtype=np.float32)
    c = np.array([0.22, 0.1, 1.05])
    for f in range(3):
        depth, mask = scene.render(cam, c)
        masks[f] = mask
        pipe.process_frame(None, depth)
    assert len(pipe.active_object_ids) == 1
    # object teleports far outside the view -> raycast misses -> not
    # visible -> deleted (EMFusion.cpp:951-960)
    for f in range(3, 5):
        depth, _ = scene.render(cam, np.array([50.0, 50.0, 50.0]))
        pipe.process_frame(None, depth)
    assert len(pipe.active_object_ids) == 0


def test_export_tree(tmp_path):
    """write_results produces the reference's debug-export directory tree
    (EMFusion.cpp:1027-1146): masks/, assoc_weights/{bg,<id>}/{pre,post}
    Track, huber_weights/{bg,<id>}, track_weights/{bg,<id>}, fg_probs/<id>,
    output/, poses + meshes."""
    import os
    from emfusion_tpu.io.writers import write_results
    from tests.synthetic import SyntheticScene

    scene = SyntheticScene()
    masks = {}

    def provider_fn(rgb, frame):
        return [Detection(mask=masks[frame],
                          scores=make_score_vector(3, 0.9))]

    pipe = EMFusionPipeline(small_params(),
                            CallableMaskProvider(provider_fn),
                            save_output=True)
    cam = np.eye(4, dtype=np.float32)
    for f in range(5):
        depth, mask = scene.render(cam, np.array([0.22, 0.1, 1.05]))
        masks[f] = mask
        pipe.process_frame(None, depth)
        pipe.outputs["renderings"][f] = pipe.render()

    out = tmp_path / "exp"
    write_results(pipe, str(out))

    assert (out / "poses-cam.txt").exists()
    oid = pipe.active_object_ids[0]
    assert (out / f"poses-{oid}.txt").exists()
    for sub in ("output", "masks",
                "assoc_weights/bg/preTrack", "assoc_weights/bg/postTrack",
                f"assoc_weights/{oid}/preTrack",
                f"assoc_weights/{oid}/postTrack",
                "track_weights/bg", f"track_weights/{oid}",
                "huber_weights/bg", f"huber_weights/{oid}",
                f"fg_probs/{oid}"):
        d = out / sub
        assert d.is_dir() and any(d.iterdir()), f"missing export {sub}"
    assert (out / "mesh_bg.ply").exists()
