"""Round-2 probe: tracking cost on the real TPU.

Measures, at the production operating point (512^3 background, 640x480):
  1. XLA take-rows rate vs row width (8/32/128/512) — decides how the
     capture gather should be expressed;
  2. capture_neighborhoods cost (the once-per-window gather);
  3. per-LM-iteration cost: gather sampler vs capture tent resampling;
  4. full track_volume wall time, gather vs capture, stride 3 and 1;
  5. E-step association_weights cost at escale 1 and 2.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    out0 = out[0] if isinstance(out, tuple) else out
    sync(out0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out0 = out[0] if isinstance(out, tuple) else out
    sync(out0)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)

    # ---- 1. take-rows rate vs width --------------------------------
    total = 16 * 1024 * 1024   # elements per gather
    for width in (8, 32, 128, 512):
        nrows_src = 1 << 20
        src = jnp.asarray(rng.rand(nrows_src, width).astype(np.float32))
        n = total // width
        idx_r = jnp.asarray(rng.randint(0, nrows_src, n).astype(np.int32))
        idx_s = jnp.asarray(np.sort(np.asarray(idx_r)))
        take = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        dtr = timeit(take, src, idx_r, iters=5)
        dts = timeit(take, src, idx_s, iters=5)
        print(f"take rows w={width}: random {dtr*1e3:.2f} ms "
              f"({total/dtr/1e9:.2f} G elem/s, {n/dtr/1e6:.1f} M rows/s); "
              f"sorted {dts*1e3:.2f} ms ({total/dts/1e9:.2f} G elem/s)")

    # ---- tracking setup ---------------------------------------------
    from emfusion_tpu.geometry.capture import capture_neighborhoods
    from emfusion_tpu.geometry.sampling import (
        sample_system_at_points, sample_volume_at_points)
    from emfusion_tpu.geometry.capture import (
        sample_system_from_cache, sample_value_from_cache)
    from emfusion_tpu.tracking import TrackConfig, track_volume
    from emfusion_tpu.ops.association import association_weights

    R = 512
    H, W = 480, 640
    voxel = 5.12 / R
    trunc = 10 * voxel
    # surface-ish volume + plausible depth points
    idx = np.arange(R, dtype=np.float32) - (R - 1) / 2
    zz = idx[:, None, None] * voxel
    tsdf = np.clip((zz - 0.3) / trunc, -1, 1
                   ).astype(np.float32) * np.ones((R, R, R), np.float32)
    weights = np.ones((R, R, R), np.float32) * 10
    tsdf_j = jnp.asarray(tsdf)
    w_j = jnp.asarray(weights)
    ys, xs = np.mgrid[0:H, 0:W]
    depth = (2.3 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
             ).astype(np.float32)
    pts_full = np.stack([(xs - 319.5) / 525.0 * depth,
                         (ys - 239.5) / 525.0 * depth, depth], 0
                        ).astype(np.float32)
    Rm = jnp.eye(3, dtype=jnp.float32)
    tv = jnp.asarray(np.array([0.0, 0.0, -2.56 + 0.0], np.float32))

    for stride in (3, 1):
        pts = jnp.asarray(
            pts_full[:, ::stride, ::stride].reshape(3, -1))
        N = pts.shape[1]
        print(f"--- stride {stride}: N={N}")
        vols = jnp.stack([tsdf_j, w_j])

        cap = jax.jit(lambda v_, p_, R_, t_: capture_neighborhoods(
            v_, p_, R_, t_, voxel))
        dt = timeit(cap, vols, pts, Rm, tv, iters=3)
        print(f"capture 6^3x2ch: {dt*1e3:.2f} ms", flush=True)
        cache, anchor = cap(vols, pts, Rm, tv)

        sysg = jax.jit(lambda T_, p_, R_, t_: sample_system_at_points(
            T_, p_, R_, t_, voxel))
        dt = timeit(sysg, tsdf_j, pts, Rm, tv, iters=3)
        wg = jax.jit(lambda W_, p_, R_, t_: sample_volume_at_points(
            W_, p_, R_, t_, voxel, margin=1))
        dt2 = timeit(wg, w_j, pts, Rm, tv, iters=3)
        print(f"gather eval (27sys + 8w): {dt*1e3:.2f} + {dt2*1e3:.2f} ms",
              flush=True)

        sysc = jax.jit(lambda c_, a_, p_, R_, t_: sample_system_from_cache(
            c_, a_, p_, R_, t_, voxel, (R, R, R)))
        dt = timeit(sysc, cache[0], anchor, pts, Rm, tv, iters=5)
        wc = jax.jit(lambda c_, a_, p_, R_, t_: sample_value_from_cache(
            c_, a_, p_, R_, t_, voxel, (R, R, R), 1))
        dt2 = timeit(wc, cache[1:2], anchor, pts, Rm, tv, iters=5)
        print(f"capture eval (sys + w): {dt*1e3:.2f} + {dt2*1e3:.2f} ms",
              flush=True)

        # full LM, realistic init error (~1 cm + small rotation)
        init = np.eye(4, dtype=np.float32)
        init[:3, 3] = np.asarray(tv) + np.array([0.008, -0.006, 0.01])
        assoc = jnp.ones((N,), jnp.float32)
        for sampler in ("capture", "gather"):
            cfg = TrackConfig(max_iter=100, sampler=sampler)
            f = jax.jit(lambda T_, W_, p_, a_, ini: track_volume(
                T_, W_, voxel, p_, a_, ini, cfg)[0])
            dt = timeit(f, tsdf_j, w_j, pts, assoc, jnp.asarray(init),
                        iters=3)
            pose, st = jax.jit(lambda T_, W_, p_, a_, ini: track_volume(
                T_, W_, voxel, p_, a_, ini, cfg))(
                    tsdf_j, w_j, pts, assoc, jnp.asarray(init))
            it = int(st["iterations"])
            rc = int(st["recaptures"]) if sampler == "capture" else 0
            print(f"track_volume[{sampler}]: {dt*1e3:.1f} ms "
                  f"({it} iters, {rc} recaptures, "
                  f"{dt*1e3/max(it,1):.2f} ms/iter)")

    # ---- E-step -------------------------------------------------------
    for escale in (2, 1):
        pts = jnp.asarray(
            pts_full[:, ::escale, ::escale].reshape(3, -1))
        f = jax.jit(lambda T_, p_, R_, t_: association_weights(
            T_, p_, R_, t_, voxel, trunc, 0.02, 0.8, 1.0)[0])
        dt = timeit(f, tsdf_j, pts, Rm, tv, iters=3)
        print(f"E-step assoc (1 model, escale {escale}, N={pts.shape[1]}): "
              f"{dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
