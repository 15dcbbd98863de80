"""Bisect the bench-scene object loss (VERDICT r3 weak #1).

Runs the EXACT bench.bench_e2e scene/frames through the pipeline with
selectable backends and per-frame lifecycle logging, so the r3
production shortcuts (band capture / sweep E-step / Pallas raycast /
drift tolerance) can be toggled one at a time to find which flips the
association/visibility deletion that kills the scene's only object.

Usage:
  python scripts/bisect_objloss.py [--res 512] [--cpu]
      [--capture band|gather] [--estep auto|sweep|gather]
      [--raycast auto|sweep_pallas|sweep|march]
      [--fusion auto|pallas|pencil|gather] [--frames 14]
"""
import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--capture", default="auto")
    ap.add_argument("--estep", default="auto")
    ap.add_argument("--raycast", default="auto")
    ap.add_argument("--fusion", default="auto")
    ap.add_argument("--stride", type=int, default=0)
    ap.add_argument("--escale", type=int, default=0)
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--carve", type=float, default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp  # noqa: F401

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(message)s")

    from emfusion_tpu.config import Params
    from emfusion_tpu.pipeline import EMFusionPipeline
    from emfusion_tpu.segmentation import (CallableMaskProvider, Detection,
                                           make_score_vector)
    from synthetic import SyntheticScene

    H, W = 480, 640
    res = args.res
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
                    capture_backend=args.capture,
                    estep_backend=args.estep,
                    raycast_backend=args.raycast,
                    fusion_backend=args.fusion,
                    tracking_stride=args.stride,
                    estep_scale=args.escale)
    if args.carve is not None:
        params.bg_carve_dist = args.carve

    masks = {}

    def provider(rgb, frame):
        if frame not in masks:
            return []
        return [Detection(mask=masks[frame],
                          scores=make_score_vector(3, 0.9))]

    frames = []
    gt_cams = []
    for f in range(args.frames):
        th = 0.004 * f
        c, s = np.cos(th), np.sin(th)
        cam = np.array([[c, 0, s, 0.01 * f], [0, 1, 0, -0.005 * f],
                        [-s, 0, c, 0.002 * f], [0, 0, 0, 1]], np.float32)
        depth, mask = scene.render(cam, np.array([0.55, 0.25,
                                                  1.6 + 0.01 * f]))
        masks[f] = mask
        frames.append(depth)
        gt_cams.append(cam)

    pipe = EMFusionPipeline(params, CallableMaskProvider(provider))
    os.environ["EMF_TRACK_STATS"] = "1"
    for f in range(args.frames):
        t0 = time.perf_counter()
        pipe.process_frame(None, frames[f])
        pipe.flush()
        cam = pipe.poses.get(f)
        cam_err = (np.linalg.norm(cam[:3, 3] - gt_cams[f][:3, 3])
                   if cam is not None else float("nan"))
        vis = pipe._h_visible.copy()
        act = pipe._h_active.copy()
        st = getattr(pipe, "last_frame_stats", None)
        extra = ""
        if st is not None and st["frame"] == f:
            k = int(np.argmax(pipe._h_ids > 0))
            extra = (f" vis_px={st['vis_counts'][k]:.0f}"
                     f" assoc_px={st['assoc_pixels'][k]:.0f}"
                     f" assoc_sum={st['assoc_sums'][k]:.1f}")
        if args.deep and pipe._last_raycast is not None:
            rc = pipe._last_raycast
            k = int(np.argmax(pipe._h_ids > 0))
            o = pipe.state.objs
            rel = (np.linalg.inv(np.asarray(o.pose[k]))
                   @ np.asarray(pipe.state.cam_pose))
            extra += (
                f" objmask={int(np.asarray(rc['obj_masks'][k]).sum())}"
                f" seg={int((np.asarray(rc['seg']) > 0).sum())}"
                f" gtmask={int(masks[f].sum())}"
                f" reltz={rel[2, 3]:.3f}")
        print(f"frame {f:2d}: {time.perf_counter()-t0:6.2f}s "
              f"active={act.sum()} visible={vis.sum()} "
              f"cam_err={cam_err*100:.2f}cm{extra}", flush=True)
    print(f"FINAL objects: {pipe.active_object_ids}")


if __name__ == "__main__":
    main()
