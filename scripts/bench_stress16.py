"""16-object stress benchmark (BASELINE.json stress config, single-chip
leg): fills the object pool with 16 spawned objects and measures the
steady-state full-frame cost plus per-frame mesh export.

The multi-host sharded leg of the stress config runs in
tests/test_distributed.py (virtual CPU mesh) and via the CLI mesh path;
real multi-chip hardware is not reachable from this image, so the TPU
measurement here is the per-chip throughput anchor.

Run: timeout 590 python scripts/bench_stress16.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def run_stress(log=print, with_mesh_export=True):
    """BASELINE stress config, single-chip leg: 16 objects, steady-
    state ms/frame. Returns (ms_per_frame, n_objects_alive,
    mesh_export_s or None). Importable (bench.py runs it as a BENCH
    extras section)."""
    import jax
    import jax.numpy as jnp
    from emfusion_tpu.config import Params
    from emfusion_tpu.pipeline import EMFusionPipeline
    from emfusion_tpu.segmentation import (CallableMaskProvider,
                                           Detection, make_score_vector)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from synthetic import SyntheticScene

    H, W = 480, 640
    res = int(os.environ.get("EMF_STRESS_RES", 512))
    vol_m = 5.12
    scene = SyntheticScene(
        H=H, W=W, f=525.0, floor_y=0.8,
        bg_spheres=((np.array([-0.6, 0.0, 2.0]), 0.55),
                    (np.array([0.7, -0.5, 2.4]), 0.4)),
        obj_sphere_r=0.0)
    params = Params(globalVolumeDims=(res, res, res),
                    globalVoxelSize=vol_m / res,
                    volumePose=(0.0, 0.0, vol_m / 2),
                    max_objects=16, visibilityThresh=200,
                    maskRCNNFrames=1000)

    # frame 0: a 4x4 grid of masks spawns 16 objects over the bg scene
    def provider(rgb, frame):
        if frame != 0:
            return []
        dets = []
        gh, gw = H // 4, W // 4
        for gy in range(4):
            for gx in range(4):
                m = np.zeros((H, W), bool)
                m[gy * gh + 12:(gy + 1) * gh - 12,
                  gx * gw + 12:(gx + 1) * gw - 12] = True
                dets.append(Detection(mask=m,
                                      scores=make_score_vector(3, 0.9)))
        return dets

    frames = []
    for f in range(10):
        th = 0.004 * f
        c, s = np.cos(th), np.sin(th)
        cam = np.array([[c, 0, s, 0.01 * f], [0, 1, 0, -0.005 * f],
                        [-s, 0, c, 0.002 * f], [0, 0, 0, 1]], np.float32)
        depth, _ = scene.render(cam, np.array([9.0, 9.0, 9.0]))
        frames.append(depth)

    pipe = EMFusionPipeline(params, CallableMaskProvider(provider))
    t0 = time.perf_counter()
    for f in range(4):
        pipe.process_frame(None, frames[f])
    pipe.flush()
    n_obj = len(pipe.active_object_ids)
    log(f"warmup: {time.perf_counter() - t0:.1f}s, "
        f"{n_obj} objects active")

    # BASELINE stress config includes per-frame mesh export
    # (EMFusion.cpp:1199-1218). Policy (stated in NOTES_R5): object
    # meshes (16 x 64^3 sparse MC) are extracted EVERY frame inside the
    # measured loop; the 512^3 background is re-meshed at the mask
    # cadence (every 30 frames) — per-frame full-volume bg meshing is
    # untenable at 512^3 and the reference's 3D window only re-draws
    # what changed. The bg cost is measured once and amortized /30 into
    # the reported ms/frame.
    import tempfile
    d = tempfile.mkdtemp() if with_mesh_export else None
    if with_mesh_export:
        from emfusion_tpu.io.writers import write_frame_meshes
        # warm the export compiles OFF the timer (first use compiles
        # the pool-MC program and the bucketed fetch-shape set through
        # the relay AOT helper at seconds each; steady-state frames
        # reuse them — same warmup policy as the e2e leg)
        t0 = time.perf_counter()
        write_frame_meshes(pipe, d, 0, objects_only=True)
        write_frame_meshes(pipe, d, 0, objects_only=True)
        log(f"mesh-export warmup (compiles): "
            f"{time.perf_counter() - t0:.1f}s")

    pipe.timer.reset()
    t0 = time.perf_counter()
    n_meas = 6
    for f in range(4, 4 + n_meas):
        pipe.process_frame(None, frames[f])
        if f + 1 < len(frames):
            pipe.prefetch_depth(frames[f + 1])
        if with_mesh_export:
            write_frame_meshes(pipe, d, pipe.frame, objects_only=True)
    pipe.flush()
    dt = (time.perf_counter() - t0) / n_meas
    n_alive = len(pipe.active_object_ids)
    log(f"16-obj steady-state{' (+frame obj meshes)' if with_mesh_export else ''}: "
        f"{dt * 1e3:.1f} ms/frame "
        f"({1.0 / dt:.2f} fps), {n_alive} objects")
    log(pipe.timer.summary())

    mesh_s = None
    if with_mesh_export:
        t0 = time.perf_counter()
        write_frame_meshes(pipe, d, pipe.frame)
        mesh_s = time.perf_counter() - t0
        log(f"full mesh export (512^3 bg + {n_alive} objects): "
            f"{mesh_s:.2f}s; amortized at mask cadence /30 -> "
            f"+{mesh_s * 1e3 / 30:.1f} ms/frame")
        dt = dt + mesh_s / 30.0
    return dt * 1e3, n_alive, mesh_s


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        import os as _os
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    run_stress()


if __name__ == "__main__":
    main()
