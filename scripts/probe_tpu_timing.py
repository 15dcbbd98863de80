"""Calibrated TPU timing probe (axon tunnel-safe).

block_until_ready appears not to synchronize under the axon remote
platform; every measurement here forces a 1-element device->host transfer
of a value derived from the result, which cannot complete before the
computation does. A known-FLOPs matmul calibrates the methodology.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    def sync(x):
        if isinstance(x, tuple):
            x = x[0]
        return float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=10, warmup=2):
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    rng = np.random.RandomState(0)

    # --- calibration: 4096^3 f32 matmul = 137 GFLOP ---------------------
    A = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    B = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    mm = jax.jit(lambda a, b: a @ b)
    dt = timeit(mm, A, B)
    print(f"matmul 4096^3 f32: {dt*1e3:.3f} ms -> "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s")

    bf = jax.jit(lambda a, b: (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)))
    dt = timeit(bf, A, B)
    print(f"matmul 4096^3 bf16: {dt*1e3:.3f} ms -> "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s")

    # --- elementwise bandwidth ------------------------------------------
    big = jnp.asarray(rng.rand(512, 512, 512).astype(np.float32))
    ew = jax.jit(lambda a: a * 1.0001 + 0.5)
    dt = timeit(ew, big)
    print(f"elementwise 512^3: {dt*1e3:.3f} ms -> "
          f"{big.size*4*2/dt/1e9:.0f} GB/s")

    # --- image gather at voxel scale ------------------------------------
    H, W = 480, 640
    img = jnp.asarray(rng.rand(H * W).astype(np.float32))
    for R in (128, 256):
        n = R ** 3
        idx = jnp.asarray(rng.randint(0, H * W, size=n).astype(np.int32))
        take = jax.jit(lambda im, ix: jnp.take(im, ix))
        dt = timeit(take, img, idx)
        print(f"take image {R}^3 idx: {dt*1e3:.3f} ms -> "
              f"{n/dt/1e9:.2f} G gathers/s (write-bw floor "
              f"{n*8/dt/1e9:.0f} GB/s)")

    # --- volume 8-corner gather (tracking/raycast pattern) --------------
    Rv = 256
    vol = jnp.asarray(rng.rand(Rv ** 3).astype(np.float32))
    npts = H * W
    idx3 = jnp.asarray(rng.randint(0, Rv**3 - Rv*Rv - Rv - 2,
                                   size=npts).astype(np.int32))

    @jax.jit
    def tri(v, ix):
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    acc = acc + jnp.take(v, ix + dz * Rv * Rv + dy * Rv + dx)
        return acc

    dt = timeit(tri, vol, idx3, iters=20)
    print(f"8-corner gather {Rv}^3 ({npts} pts): {dt*1e3:.3f} ms")

    # --- the real fusion step at 256^3 ----------------------------------
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.ops.fusion import integrate_tsdf, compute_gradients
    R = 256
    voxel = 5.12 / R
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = jnp.asarray((1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
                         ).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    tsdf = jnp.zeros((R, R, R))
    wts = jnp.zeros((R, R, R))
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    fuse = jax.jit(lambda t, w: integrate_tsdf(
        t, w, depth, assoc, rot, tr, intr, voxel, 10 * voxel, 64.0))
    t0 = time.perf_counter()
    out = fuse(tsdf, wts)
    sync(out[0])
    print(f"fuse 256^3 compile+run: {time.perf_counter()-t0:.1f} s")
    dt = timeit(fuse, tsdf, wts, iters=10)
    bw = R**3 * 4 * 5 / dt / 1e9
    print(f"fuse 256^3: {dt*1e3:.3f} ms -> {1/dt:.1f} fps ({bw:.0f} GB/s)")

    grad = jax.jit(compute_gradients)
    dt = timeit(grad, out[0], iters=10)
    print(f"grads 256^3: {dt*1e3:.3f} ms "
          f"({R**3*4*4/dt/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
