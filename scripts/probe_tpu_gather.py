"""Probe: gather strategies on TPU — measurements that decide the Pallas
kernel design for fusion/raycast/tracking.

All hot ops in this framework reduce to one primitive: gather from a 2-D
image (fusion: depth lookup per voxel) or 3-D volume (raycast/tracking:
trilinear sampling at arbitrary points). TPUs have no fast arbitrary
gather in the VPU; this script measures what XLA's gather lowering
actually delivers on the real chip, plus whether Mosaic (Pallas) supports
jnp.take inside a kernel.

Run on the real TPU:  python scripts/probe_tpu_gather.py
"""
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    rng = np.random.RandomState(0)

    # --- 1. image gather at volume scale (fusion pattern) ---------------
    H, W = 480, 640
    img = jnp.asarray(rng.rand(H * W).astype(np.float32))
    for R in (256, 384):
        n = R ** 3
        idx = jnp.asarray(rng.randint(0, H * W, size=n).astype(np.int32))

        take = jax.jit(lambda im, ix: jnp.take(im, ix))
        dt = timeit(take, img, idx)
        gbs = n * (4 + 4 + 4) / dt / 1e9  # idx read + out write + src read
        print(f"take image ({R}^3 random idx): {dt*1e3:.2f} ms "
              f"({n/dt/1e9:.2f} G gathers/s, ~{gbs:.0f} GB/s eff)")

        # coherent indices (what projective fusion actually produces)
        idx_c = jnp.asarray(
            np.clip(np.arange(n) % (H * W), 0, H * W - 1).astype(np.int32))
        dt = timeit(take, img, idx_c)
        print(f"take image ({R}^3 coherent idx): {dt*1e3:.2f} ms "
              f"({n/dt/1e9:.2f} G gathers/s)")

    # --- 2. 3-D volume gather (trilinear pattern: 8 corners) ------------
    Rv = 512
    vol = jnp.asarray(rng.rand(Rv * Rv * Rv).astype(np.float32))
    npts = 480 * 640
    idx3 = jnp.asarray(rng.randint(0, Rv ** 3, size=npts).astype(np.int32))
    take = jax.jit(lambda v, ix: jnp.take(v, ix))
    dt = timeit(take, vol, idx3, iters=20)
    print(f"take 512^3 volume ({npts} random idx): {dt*1e3:.3f} ms "
          f"({npts/dt/1e9:.3f} G gathers/s)")

    # full trilinear: 8 gathers + lerp
    @jax.jit
    def tri(v, ix):
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    acc += jnp.take(v, ix + dz * Rv * Rv + dy * Rv + dx)
        return acc

    dt = timeit(tri, vol, idx3, iters=20)
    print(f"8-corner gather 512^3 ({npts} pts): {dt*1e3:.3f} ms")

    # --- 3. Pallas: does jnp.take compile inside a Mosaic kernel? -------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(img_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(img_ref[:], idx_ref[:], axis=0)

    flat = jnp.asarray(rng.rand(H * W).astype(np.float32))
    idxs = jnp.asarray(rng.randint(0, H * W, (8, 128)).astype(np.int32))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(flat, idxs)
        ref = np.take(np.asarray(flat), np.asarray(idxs))
        ok = np.allclose(np.asarray(out), ref)
        print(f"pallas jnp.take(1D src, 2D idx): COMPILES, correct={ok}")
    except Exception as e:
        print(f"pallas jnp.take(1D src, 2D idx): FAILS [{type(e).__name__}] "
              f"{str(e)[:200]}")

    # 2D source, take_along_axis within rows
    def kern2(img_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(img_ref[:], idx_ref[:], axis=1)

    img2 = jnp.asarray(rng.rand(8, 512).astype(np.float32))
    idx2 = jnp.asarray(rng.randint(0, 512, (8, 128)).astype(np.int32))
    try:
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img2, idx2)
        ref = np.take_along_axis(np.asarray(img2), np.asarray(idx2), axis=1)
        ok = np.allclose(np.asarray(out), ref)
        print(f"pallas take_along_axis(axis=1): COMPILES, correct={ok}")
    except Exception as e:
        print(f"pallas take_along_axis(axis=1): FAILS [{type(e).__name__}] "
              f"{str(e)[:200]}")

    # --- 4. elementwise roofline sanity (what does a pure map achieve?) --
    big = jnp.asarray(rng.rand(512, 512, 512).astype(np.float32))

    @jax.jit
    def ewise(a):
        return a * 1.0001 + 0.5

    dt = timeit(ewise, big, iters=10)
    gbs = big.size * 4 * 2 / dt / 1e9
    print(f"elementwise 512^3 (read+write): {dt*1e3:.2f} ms ({gbs:.0f} GB/s)")


if __name__ == "__main__":
    main()
