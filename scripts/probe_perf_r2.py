"""Round-2 probe: trustworthy building-block timings on the axon TPU.

block_until_ready does NOT synchronize through the axon relay; every
timing here fences with a host value fetch. Measures:
  1. streaming bandwidth (elementwise copy+axpy at 512^3)
  2. MXU matmul rate: f32 HIGHEST / f32 DEFAULT / bf16, VMEM-scale shapes
  3. XLA gather: random & coherent take at fusion scale
  4. warp_to_grid (pencil stage 0) alone
  5. full pencil fusion step breakdown (f32 vs bf16, full vs half grid)
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=10, warmup=3):
        for _ in range(warmup):
            out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        sync(out)
        return (time.perf_counter() - t0) / iters

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)

    # 1. streaming bandwidth
    big = jnp.asarray(rng.rand(512, 512, 512).astype(np.float32))
    axpy = jax.jit(lambda a: a * 1.0001 + 0.5)
    dt = timeit(axpy, big, iters=20)
    print(f"axpy 512^3: {dt*1e3:.2f} ms -> {big.size*8/dt/1e9:.0f} GB/s")

    two = jnp.asarray(rng.rand(512, 512, 512).astype(np.float32))
    fuse2 = jax.jit(lambda a, b: (a * 0.5 + b * 0.25, jnp.minimum(a + b, 3.0)))
    dt = timeit(fuse2, big, two, iters=20)
    print(f"2in2out 512^3: {dt*1e3:.2f} ms -> {big.size*16/dt/1e9:.0f} GB/s")

    # 2. matmul rates (square, MXU-friendly)
    for n in (2048, 4096):
        a = jnp.asarray(rng.rand(n, n).astype(np.float32))
        b = jnp.asarray(rng.rand(n, n).astype(np.float32))
        fl = 2 * n ** 3

        mmH = jax.jit(lambda a, b: (a @ b))
        dt = timeit(mmH, a, b)
        print(f"matmul f32 HIGHEST {n}: {dt*1e3:.2f} ms "
              f"{fl/dt/1e12:.1f} TFLOP/s")

        mmD = jax.jit(lambda a, b: jnp.dot(a, b,
                                           precision=jax.lax.Precision.DEFAULT))
        dt = timeit(mmD, a, b)
        print(f"matmul f32 DEFAULT {n}: {dt*1e3:.2f} ms "
              f"{fl/dt/1e12:.1f} TFLOP/s")

        abf = a.astype(jnp.bfloat16)
        bbf = b.astype(jnp.bfloat16)
        mmB = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32))
        dt = timeit(mmB, abf, bbf)
        print(f"matmul bf16 {n}: {dt*1e3:.2f} ms {fl/dt/1e12:.1f} TFLOP/s")

    # 3. XLA gathers at fusion scale
    H, W = 480, 640
    img = jnp.asarray(rng.rand(H * W).astype(np.float32))
    n = 256 ** 3
    idx_r = jnp.asarray(rng.randint(0, H * W, size=n).astype(np.int32))
    take = jax.jit(lambda im, ix: jnp.take(im, ix))
    dt = timeit(take, img, idx_r, iters=5)
    print(f"take 1D random ({n} idx): {dt*1e3:.2f} ms "
          f"({n/dt/1e9:.2f} G/s)")
    idx_c = jnp.asarray((np.arange(n) % (H * W)).astype(np.int32))
    dt = timeit(take, img, idx_c, iters=5)
    print(f"take 1D coherent: {dt*1e3:.2f} ms ({n/dt/1e9:.2f} G/s)")

    # row gather: take rows from a (608, 896) grid
    SB, LB = 608, 896
    DB = jnp.asarray(rng.rand(SB, LB).astype(np.float32))
    ridx = jnp.asarray(np.sort(rng.randint(0, SB, 512 * 512)).astype(np.int32))
    takerow = jax.jit(lambda d, ix: jnp.take(d, ix, axis=0))
    dt = timeit(takerow, DB, ridx, iters=3)
    ne = 512 * 512 * LB
    print(f"take rows (262k row idx x {LB}): {dt*1e3:.2f} ms "
          f"({ne/dt/1e9:.1f} G elem/s)")

    # 4. warp_to_grid alone
    from emfusion_tpu.ops.fusion_pencil import (
        _pencil_setup, _window_from_quad)
    depth = jnp.asarray(
        (1.5 + 0.2 * np.sin(np.arange(H * W) / 11.0)).reshape(H, W)
        .astype(np.float32))
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    th = np.deg2rad(15)
    rel_rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    rel_trans = jnp.asarray(np.array([0, 0, 2.56], np.float32))
    R = 512
    voxel = 5.12 / R

    @jax.jit
    def warp(depth):
        Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
            rel_rot, rel_trans, intr, voxel, R, R, R)
        a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=R, Y=R)
        nS, nL = 608, 896
        f32 = jnp.float32
        jj = (jnp.arange(nL, dtype=f32) + 0.5) / nL * da + a0
        ii = (jnp.arange(nS, dtype=f32) + 0.5) / nS * db + b0
        ag = jnp.broadcast_to(jj[None, :], (nS, nL))
        bg = jnp.broadcast_to(ii[:, None], (nS, nL))
        hom_u = Bmat[0, 0] * ag + Bmat[0, 1] * bg + Bmat[0, 2]
        hom_w = Bmat[1, 0] * ag + Bmat[1, 1] * bg + Bmat[1, 2]
        hom_z = Bmat[2, 0] * ag + Bmat[2, 1] * bg + Bmat[2, 2]
        zsafe = jnp.where(jnp.abs(hom_z) < 1e-12, 1e-12, hom_z)
        ug = hom_u / zsafe
        wg = hom_w / zsafe
        pu = jnp.clip(jnp.floor(ug + 0.5), 0, W - 1).astype(jnp.int32)
        pw = jnp.clip(jnp.floor(wg + 0.5), 0, H - 1).astype(jnp.int32)
        inb = (ug > -0.5) & (ug < W - 0.5) & (wg > -0.5) \
            & (wg < H - 0.5) & (hom_z > 0)
        flat = pw * W + pu
        return jnp.where(inb, jnp.take(depth.reshape(-1), flat), 0.0)

    dt = timeit(warp, depth, iters=5)
    print(f"warp_to_grid 608x896: {dt*1e3:.2f} ms")

    # 5. full pencil step variants
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    tsdf = jnp.zeros((R, R, R))
    wts = jnp.zeros((R, R, R))
    assoc = jnp.ones((H, W), jnp.float32)

    for bf16 in (False, True):
        f = jax.jit(lambda t, w, bf=bf16: integrate_tsdf_pencil(
            t, w, depth, assoc, rel_rot, rel_trans, intr, voxel,
            10 * voxel, 64.0, bf16=bf))
        dt = timeit(f, tsdf, wts, iters=5)
        print(f"pencil 512^3 bf16={bf16}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
