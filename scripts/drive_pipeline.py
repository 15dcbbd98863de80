"""End-to-end drive of the full EM-Fusion pipeline on a synthetic scene.

Moving camera + moving object sphere; masks at the configured cadence.
Prints per-frame camera pose error, object trajectory error and lifecycle
events. Exits nonzero if tracking drifts or the object is not
spawned/tracked.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if os.environ.get("EMF_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from emfusion_tpu.config import Params  # noqa: E402
from emfusion_tpu.pipeline import EMFusionPipeline  # noqa: E402
from emfusion_tpu.segmentation import (  # noqa: E402
    CallableMaskProvider, Detection, make_score_vector,
)
from emfusion_tpu.geometry import se3_exp  # noqa: E402
from synthetic import SyntheticScene  # noqa: E402


def main():
    scene = SyntheticScene()
    params = Params(
        frameSize=(160, 120), fx=120.0, fy=120.0, cx=79.5, cy=59.5,
        globalVolumeDims=(96, 96, 96), globalVoxelSize=0.03,
        volumePose=(0.0, 0.0, 1.4), objVolumeDims=(32, 32, 32),
        maxTrackingIter=40, maskRCNNFrames=3, visibilityThresh=60,
        mask_min_pixels=60, raycast_max_steps=384, max_objects=4)

    masks = {}

    def provider(rgb, frame):
        return [Detection(mask=masks[frame],
                          scores=make_score_vector(3, 0.9))]

    pipe = EMFusionPipeline(params, CallableMaskProvider(provider))

    n_frames = 10
    cam_errs, obj_spawn = [], None
    for f in range(n_frames):
        xi = np.array([0.004 * f, -0.003 * f, 0.002 * f,
                       0.003 * f, 0.002 * f, -0.002 * f], np.float32)
        cam_gt = np.asarray(se3_exp(jnp.asarray(xi)))
        obj_c = np.array([0.22 + 0.012 * f, 0.1, 1.05])
        depth, mask = scene.render(cam_gt, obj_c)
        masks[f] = mask
        pipe.process_frame(None, depth)
        err = np.linalg.norm(pipe.poses[f][:3, 3] - cam_gt[:3, 3])
        cam_errs.append(err)
        ids = pipe.active_object_ids
        if ids and obj_spawn is None:
            obj_spawn = (f, ids[0])
        print(f"frame {f}: cam |dt| err = {err*1000:.1f} mm, "
              f"objects = {ids}")

    # coarse 3cm-voxel map: per-frame bias ~0.4 voxel (projective-TSDF
    # discretization, same as reference math); bound cumulative drift at
    # 1.2 voxels over 10 frames
    assert max(cam_errs) < 1.2 * params.globalVoxelSize, \
        f"camera drift: {max(cam_errs)}"
    assert obj_spawn is not None, "no object spawned"
    oid = obj_spawn[1]
    traj = pipe.obj_poses[oid]
    f0, fl = min(traj), max(traj)
    dx_est = traj[fl][0, 3] - traj[f0][0, 3]
    dx_true = 0.012 * (fl - f0)
    print(f"object {oid}: est dx = {dx_est:.4f} m, true dx = {dx_true:.4f} m")
    assert dx_est > 0.3 * dx_true, "object not tracked"

    img = pipe.render()
    try:
        import imageio
        imageio.imwrite("/tmp/pipeline_render.png", img)
        print("render saved to /tmp/pipeline_render.png,",
              (img.sum(-1) > 0).sum(), "lit px")
    except Exception:
        pass
    print("PIPELINE DRIVE OK: max cam err %.1f mm" % (max(cam_errs) * 1000))


if __name__ == "__main__":
    main()
