"""Batched TPU perf experiment: bf16 vs f32 pencil/sweep, matmul rates,
E-step subset cost. One process to amortize the remote-compile tax."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    from emfusion_tpu.ops.raycast_sweep import raycast_sweep
    from emfusion_tpu.ops.association import association_weights

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def sync(x):
        if isinstance(x, dict):
            x = x["raylengths"]
        if isinstance(x, tuple):
            x = x[0]
        return float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=10, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    rng = np.random.RandomState(0)

    # pure matmul rates (sanity: bf16 vs f32 MXU)
    A32 = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    B32 = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    Ab = A32.astype(jnp.bfloat16)
    Bb = B32.astype(jnp.bfloat16)
    mm32 = jax.jit(lambda a, b: jax.lax.dot(a, b,
                                            precision=jax.lax.Precision.HIGHEST))
    mmbf = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32))
    dt = timeit(mm32, A32, B32)
    print(f"matmul f32 4096^3: {dt*1e3:.2f} ms = "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)
    dt = timeit(mmbf, Ab, Bb)
    print(f"matmul bf16 4096^3: {dt*1e3:.2f} ms = "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)
    # f32 inputs with default precision (lowered to bf16x3 passes?)
    mmdef = jax.jit(lambda a, b: jax.lax.dot(
        a, b, precision=jax.lax.Precision.DEFAULT))
    dt = timeit(mmdef, A32, B32)
    print(f"matmul f32-default 4096^3: {dt*1e3:.2f} ms = "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)

    H, W = 480, 640
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = jnp.asarray((1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
                         ).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    th = np.deg2rad(15)
    rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    R = 512
    voxel = 5.12 / R
    trunc = 10 * voxel
    tsdf = jnp.zeros((R, R, R), jnp.float32)
    wts = jnp.zeros((R, R, R), jnp.float32)

    for bf16 in (False, True):
        fn = lambda t, w: integrate_tsdf_pencil(
            t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
            oversample=1.5, bf16=bf16)
        t0 = time.perf_counter()
        out = fn(tsdf, wts)
        sync(out)
        print(f"fuse 512^3 bf16={bf16} compile: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        dt = timeit(fn, tsdf, wts, iters=10)
        print(f"fuse 512^3 bf16={bf16}: {dt*1e3:.2f} ms = {1/dt:.1f} fps",
              flush=True)

    # sphere volume for a realistic sweep (zero vol early-outs nothing)
    g = (np.arange(R) - (R - 1) / 2.0) * voxel
    zz = g[:, None, None]; yy = g[None, :, None]; xx = g[None, None, :]
    d = np.sqrt(xx**2 + yy**2 + zz**2) - 1.5
    svol = jnp.asarray(np.clip(d / trunc, -1, 1).astype(np.float32))
    swts = jnp.ones((R, R, R), jnp.float32)
    rel_t = jnp.asarray(np.array([0, 0, -2.56], np.float32))

    for bf16 in (False, True):
        fn = lambda t, w: raycast_sweep(t, w, jnp.eye(3), rel_t, intr,
                                        voxel, trunc, H, W, bf16=bf16)
        t0 = time.perf_counter()
        out = fn(svol, swts)
        sync(out)
        print(f"sweep 512^3 bf16={bf16} compile: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        dt = timeit(fn, svol, swts, iters=5)
        print(f"sweep 512^3 bf16={bf16}: {dt*1e3:.2f} ms", flush=True)

    # E-step single volume at scale 1 and 2
    pts = jnp.asarray(np.stack([(xs - 319.5) / 525.0 * depth,
                                (ys - 239.5) / 525.0 * depth, depth],
                               0).astype(np.float32))
    for scale in (1, 2):
        p = pts[:, ::scale, ::scale]
        fn = jax.jit(lambda t, pp: association_weights(
            t, pp, rot, tr, voxel, trunc, 0.02, 0.8, 1.0)[0])
        dt = timeit(fn, svol, p, iters=10)
        print(f"estep bg scale={scale}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
