"""Probe (r4): camera-LM per-iteration cost decomposition on the
band-capture path at production shapes (512^3, N=34k, bf16 cache).

NOTES_R3 attributes ~240 ms/frame to the camera LM (~2 x 65 ms 3-axis
captures + ~100 damped iterations). This probe separates:
  * track_volume wall time at max_iter = 1 / 25 / 100 (marginal cost
    per iteration),
  * the standalone costs of each per-iteration piece: tent system
    eval from the cache, value eval, drift check, 6x6 solve,
    se3 log/exp,
  * the capture itself (1-axis and 3-axis).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    import dataclasses
    from emfusion_tpu.geometry.band_capture import (band_capture_multi,
                                                    grid_dims_for)
    from emfusion_tpu.geometry.capture import (
        WIN, drift_ok, sample_system_from_cache, sample_value_from_cache)
    from emfusion_tpu.geometry.se3 import se3_exp, se3_log
    from emfusion_tpu.tracking import TrackConfig, track_volume

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def timeit(fn, *args, iters=10, warmup=2):
        def sync(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jnp.asarray(leaf).ravel()[0])
        for _ in range(warmup):
            out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    R = 512
    voxel = 5.12 / R
    H, W = 480, 640
    stride = 3
    hs, ws = (H + 2) // 3, (W + 2) // 3
    N = hs * ws
    f32 = jnp.float32

    # realistic-ish volume: sphere + floor SDF
    ax = (jnp.arange(R, dtype=f32) - (R - 1) / 2) * voxel
    z, y, x = jnp.meshgrid(ax, ax, ax, indexing="ij")
    d = jnp.minimum(jnp.sqrt(x * x + y * y + (z) ** 2) - 1.8, 1.3 - y)
    tsdf = jnp.clip(d / (10 * voxel), -1, 1).astype(jnp.bfloat16)
    weights = jnp.where(jnp.abs(d) < 0.5, 32.0, 0.0
                        ).astype(jnp.bfloat16)

    ys_, xs_ = np.mgrid[0:H:stride, 0:W:stride]
    depth = (1.5 + 0.2 * np.sin(xs_ / 11.0) * np.cos(ys_ / 7.0)
             ).astype(np.float32)
    pts = jnp.asarray(np.stack([
        (xs_ - 319.5) / 525.0 * depth, (ys_ - 239.5) / 525.0 * depth,
        depth], 0).reshape(3, -1).astype(np.float32))
    assoc = jnp.ones((N,), f32)
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    scale_t = jnp.diag(jnp.asarray([1 / 3, 1 / 3, 1.0], f32))
    intr_t = scale_t @ intr
    rel = jnp.eye(4, dtype=f32).at[2, 3].set(2.56)

    SB, LB = grid_dims_for(hs, ws)
    vols = jnp.stack([tsdf.astype(f32), weights.astype(f32)])

    # capture costs
    cap1 = jax.jit(lambda v: band_capture_multi(
        v, pts, rel[:3, :3], rel[:3, 3], voxel, intr_t, hs, ws, SB, LB,
        axes=(2,), backend="pallas"))
    dt = timeit(cap1, vols, iters=5)
    print(f"band capture 1-axis: {dt * 1e3:.1f} ms", flush=True)
    cap3 = jax.jit(lambda v: band_capture_multi(
        v, pts, rel[:3, :3], rel[:3, 3], voxel, intr_t, hs, ws, SB, LB,
        axes=(2, 1, 0), backend="pallas"))
    dt = timeit(cap3, vols, iters=5)
    print(f"band capture 3-axis: {dt * 1e3:.1f} ms", flush=True)

    cache, anchor = jax.jit(lambda v: cap3(v))(vols)
    cache = cache.astype(jnp.bfloat16)
    cache.block_until_ready()
    print(f"cache: {cache.shape} {cache.dtype}", flush=True)

    # per-iteration pieces
    fsys = jax.jit(lambda c, R_, t_: sample_system_from_cache(
        c[0], anchor, pts, R_, t_, voxel, tsdf.shape))
    dt = timeit(fsys, cache, rel[:3, :3], rel[:3, 3])
    print(f"tent system eval (psi+g3): {dt * 1e3:.2f} ms", flush=True)

    fval = jax.jit(lambda c, R_, t_: sample_value_from_cache(
        c[1:2], anchor, pts, R_, t_, voxel, tsdf.shape, margin=1))
    dt = timeit(fval, cache, rel[:3, :3], rel[:3, 3])
    print(f"tent value eval (1ch): {dt * 1e3:.2f} ms", flush=True)

    fdrift = jax.jit(lambda R_, t_: drift_ok(anchor, pts, R_, t_, voxel,
                                             tsdf.shape))
    dt = timeit(fdrift, rel[:3, :3], rel[:3, 3])
    print(f"drift check: {dt * 1e3:.2f} ms", flush=True)

    A = jnp.asarray(rng.rand(6, 6).astype(np.float32))
    A = A @ A.T + 6 * jnp.eye(6)
    b = jnp.asarray(rng.rand(6).astype(np.float32))
    fsolve = jax.jit(lambda A, b: jnp.linalg.solve(A, b))
    dt = timeit(fsolve, A, b, iters=50)
    print(f"6x6 linalg.solve: {dt * 1e3:.3f} ms", flush=True)

    fse3 = jax.jit(lambda T: se3_exp(-se3_log(T)))
    dt = timeit(fse3, rel, iters=50)
    print(f"se3 log+exp: {dt * 1e3:.3f} ms", flush=True)

    # J assembly + normal equations
    def neq(c, R_, t_):
        psi, g3 = sample_system_from_cache(c[0], anchor, pts, R_, t_,
                                           voxel, tsdf.shape)
        p = R_ @ pts + t_[:, None]
        Jr = jnp.cross(p, g3, axis=0)
        J = jnp.concatenate([g3, Jr], axis=0)
        Jw = J * assoc[None]
        return Jw @ J.T, Jw @ psi
    fneq = jax.jit(neq)
    dt = timeit(fneq, cache, rel[:3, :3], rel[:3, 3])
    print(f"system eval + J + normal eqs: {dt * 1e3:.2f} ms", flush=True)

    # full LM at different iteration caps
    SBt, LBt = SB, LB
    for mi in (1, 5, 25, 100):
        cfg = TrackConfig(max_iter=mi, sampler="capture",
                          capture_backend="band")
        f = jax.jit(lambda t_, w_: track_volume(
            t_, w_, voxel, pts, assoc, rel, cfg,
            band_args=(intr_t, hs, ws, SBt, LBt, (2, 1, 0), "pallas")))
        dt = timeit(f, tsdf, weights, iters=3)
        out, st = f(tsdf, weights)
        print(f"track_volume max_iter={mi}: {dt * 1e3:.1f} ms "
              f"(ran {int(st['iterations'])} iters, "
              f"{int(st['recaptures'])} recaps)", flush=True)


if __name__ == "__main__":
    main()
