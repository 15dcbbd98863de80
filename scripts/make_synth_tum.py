"""Generate a synthetic TUM-format RGB-D dataset from the analytic scene.

Writes rgb/*.png, depth/*.png (16-bit, x5000), associations.txt,
groundtruth.txt and calibration.txt — so the CLI + ATE eval harness can be
driven end-to-end without real benchmark data. A moving object sphere is
included; its masks are saved as reference-format Mask%04d.plk pickles.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--focal", type=float, default=120.0)
    ap.add_argument("--motion-scale", type=float, default=1.0)
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp
    import jax
    jax.config.update("jax_platforms", "cpu")
    from emfusion_tpu.geometry import se3_exp
    from emfusion_tpu.io.writers import write_pose_file
    from emfusion_tpu.segmentation import (
        Detection, make_score_vector, save_detections)
    from synthetic import SyntheticScene

    scene = SyntheticScene(H=args.height, W=args.width, f=args.focal)
    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "masks"), exist_ok=True)

    assoc_lines = []
    gt_poses = {}
    for f in range(args.frames):
        s = args.motion_scale
        xi = np.array([0.003 * f * s, -0.002 * f * s, 0.0015 * f * s,
                       0.002 * f * s, 0.0015 * f * s, -0.001 * f * s],
                      np.float32)
        cam = np.asarray(se3_exp(jnp.asarray(xi)))
        obj_c = np.array([0.22 + 0.01 * f * s, 0.1, 1.05])
        depth, mask = scene.render(cam, obj_c)

        ts = f / 30.0
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        rgb = np.zeros((args.height, args.width, 3), np.uint8)
        rgb[..., 0] = np.clip(depth * 80, 0, 255).astype(np.uint8)
        rgb[mask] = (200, 60, 60)
        cv2.imwrite(os.path.join(args.out, "depth", f"{ts:.6f}.png"), d16)
        cv2.imwrite(os.path.join(args.out, "rgb", f"{ts:.6f}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        assoc_lines.append(
            f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
        gt_poses[f] = cam
        save_detections(
            os.path.join(args.out, "masks", f"Mask{f:04d}.plk"),
            [Detection(mask=mask, scores=make_score_vector(3, 0.9))])

    with open(os.path.join(args.out, "associations.txt"), "w") as fh:
        fh.write("\n".join(assoc_lines) + "\n")
    with open(os.path.join(args.out, "calibration.txt"), "w") as fh:
        fh.write(f"{args.focal} {args.focal} "
                 f"{args.width / 2 - 0.5} {args.height / 2 - 0.5}\n")
    write_pose_file(os.path.join(args.out, "groundtruth.txt"), gt_poses,
                    timestamps={f: f / 30.0 for f in gt_poses})
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
