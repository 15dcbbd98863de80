"""TPU probe: LM tracking cost with the fused 27-corner system sampler.

Times one jitted track_volume call (camera vs 512^3 background, stride-3
point count) and checks it still converges on a synthetic sphere scene.
Run detached: setsid nohup python scripts/probe_tracking_tpu.py > log &
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.tracking import TrackConfig, track_volume

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    R = int(os.environ.get("EMF_PROBE_RES", 512))
    voxel = 5.12 / R
    trunc = 10 * voxel
    g = (np.arange(R) - (R - 1) / 2.0) * voxel
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt(xx**2 + yy**2 + zz**2) - 1.0
    tsdf = jnp.asarray(np.clip(d / trunc, -1, 1).astype(np.float32))
    weights = jnp.asarray((np.abs(d) < 3 * trunc).astype(np.float32) * 8)
    del zz, yy, xx, d

    # synthetic surface points: sphere seen from z=-2.2 (camera frame)
    H, W = 160, 214  # 480/3 x 640/3
    f = 525.0 / 3.0
    ys, xs = np.mgrid[0:H, 0:W]
    ux = (xs - (W - 1) / 2) / f
    uy = (ys - (H - 1) / 2) / f
    # ray-sphere intersection from camera at volume (0,0,-2.2)
    oz = -2.2
    a = ux**2 + uy**2 + 1
    b = 2 * oz
    c = oz**2 - 1.0
    disc = b**2 - 4 * a * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    pts = np.stack([ux * t, uy * t, t], 0).astype(np.float32).reshape(3, -1)
    pts = jnp.asarray(pts)
    assoc = jnp.asarray(hit.astype(np.float32).reshape(-1))

    rel0 = np.eye(4, dtype=np.float32)
    # camera sits at volume z=oz looking toward +z: p_vol = p_cam + (0,0,oz)
    rel0[2, 3] = oz
    # perturb the initial pose
    rel_init = rel0.copy()
    rel_init[0, 3] += 0.03
    rel_init[1, 3] -= 0.02
    rel_init[2, 3] += 0.025

    cfg = TrackConfig(max_iter=100)
    # volumes/points must be jit ARGUMENTS: closed-over arrays embed as
    # HLO constants and the 512^3 upload blows the remote-compile body
    # limit (HTTP 413) on the axon relay
    fn = jax.jit(lambda ts, ws, pp, aa, rp: track_volume(
        ts, ws, voxel, pp, aa, rp, cfg))
    t0 = time.perf_counter()
    pose, stats = fn(tsdf, weights, pts, assoc, jnp.asarray(rel_init))
    err0 = np.linalg.norm(np.asarray(pose)[:3, 3] - rel0[:3, 3])
    print(f"compile+run: {time.perf_counter() - t0:.1f}s, "
          f"iters={int(stats['iterations'])}, |dt| err={err0 * 1000:.2f} mm",
          flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        pose, stats = fn(tsdf, weights, pts, assoc, jnp.asarray(rel_init))
        np.asarray(pose)
        dt = time.perf_counter() - t0
        print(f"track_volume {R}^3, N={pts.shape[1]}: {dt * 1e3:.1f} ms "
              f"({int(stats['iterations'])} iters, "
              f"{dt * 1e3 / max(int(stats['iterations']), 1):.2f} ms/iter)",
              flush=True)
    assert err0 < 2 * voxel, err0
    print("TRACKING PROBE OK", flush=True)


if __name__ == "__main__":
    main()
