"""Round-2 probe: which gather forms compile inside Mosaic/Pallas now?

Round-1 finding: tpu.dynamic_gather -> HTTP 500 on every shape. Round-2
re-probe of probe_tpu_gather.py returns "NotImplementedError: Only 2D
gather is supported" — i.e. the lowering EXISTS now for 2-D cases. This
script enumerates the 2-D forms and times the working ones with a
host-value sync (block_until_ready does NOT synchronize through the axon
relay — timings without a value fetch are meaningless).
"""
import sys
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)

    def try_pallas(name, kern, out_shape, *args):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            return out
        except Exception as e:
            print(f"{name}: FAILS [{type(e).__name__}] {str(e)[:160]}")
            return None

    H, W = 512, 640

    # form A: take_along_axis axis=1, idx same shape as src
    src = jnp.asarray(rng.rand(H, W).astype(np.float32))
    idxA = jnp.asarray(rng.randint(0, W, (H, W)).astype(np.int32))

    def kernA(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=1)

    out = try_pallas("A take_along_axis ax=1 same-shape", kernA, (H, W),
                     src, idxA)
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idxA), 1)
        print("A take_along_axis ax=1 same-shape: OK correct=",
              np.allclose(np.asarray(out), ref))

    # form B: take_along_axis axis=0, idx same shape
    idxB = jnp.asarray(rng.randint(0, H, (H, W)).astype(np.int32))

    def kernB(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=0)

    out = try_pallas("B take_along_axis ax=0 same-shape", kernB, (H, W),
                     src, idxB)
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idxB), 0)
        print("B take_along_axis ax=0 same-shape: OK correct=",
              np.allclose(np.asarray(out), ref))

    # form C: row gather — jnp.take(src, row_idx, axis=0), 1-D idx
    idxC = jnp.asarray(rng.randint(0, H, (256,)).astype(np.int32))

    def kernC(s, i, o):
        o[:] = jnp.take(s[:], i[:], axis=0)

    out = try_pallas("C take rows (1D idx)", kernC, (256, W), src, idxC)
    if out is not None:
        ref = np.take(np.asarray(src), np.asarray(idxC), axis=0)
        print("C take rows: OK correct=", np.allclose(np.asarray(out), ref))

    # form D: smaller idx, take_along_axis axis=1 with idx (H, 128)
    idxD = jnp.asarray(rng.randint(0, W, (H, 128)).astype(np.int32))

    def kernD(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=1)

    out = try_pallas("D take_along_axis ax=1 narrow idx", kernD, (H, 128),
                     src, idxD)
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idxD), 1)
        print("D narrow: OK correct=", np.allclose(np.asarray(out), ref))

    # now TIME the working forms vs the one-hot matmul equivalent
    # fusion-like workload: gather a (512, 512) slice's depth values from
    # a (608, 896) B-grid = two chained 1-D resamples.
    if True:
        # timing A at fusion scale: 512 slices x (512,512) from B-grid
        SB, LB = 608, 896
        DB = jnp.asarray(rng.rand(SB, LB).astype(np.float32))

        # emulate per-slice: rows (Y=512) pick from SB, cols pick from LB
        Y = X = 512
        rowi = jnp.asarray(np.sort(rng.randint(0, SB, (Y,))).astype(np.int32))
        coli = jnp.asarray(
            np.sort(rng.randint(0, LB, (X,))).astype(np.int32))

        def kern_slice(d, ri, ci, o):
            rows = jnp.take(d[:], ri[:], axis=0)          # (Y, LB)
            cmat = jnp.broadcast_to(ci[:][None, :], (Y, X))
            o[:] = jnp.take_along_axis(rows, cmat, axis=1)

        try:
            out = pl.pallas_call(
                kern_slice,
                out_shape=jax.ShapeDtypeStruct((Y, X), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(DB, rowi, coli)
            ref = np.asarray(DB)[np.asarray(rowi)][:, np.asarray(coli)]
            print("slice 2-stage gather: OK correct=",
                  np.allclose(np.asarray(out), ref))

            f = jax.jit(lambda d, r, c: pl.pallas_call(
                kern_slice,
                out_shape=jax.ShapeDtypeStruct((Y, X), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(d, r, c))
            dt = timeit(f, DB, rowi, coli)
            print(f"slice 2-stage gather (512x512 from {SB}x{LB}): "
                  f"{dt*1e6:.1f} us/slice -> {dt*512*1e3:.2f} ms/512 slices")
        except Exception as e:
            print(f"slice 2-stage gather: FAILS [{type(e).__name__}] "
                  f"{str(e)[:160]}")

    # reference: XLA one-hot matmul cost for same op (from r1: ~19ms/512)
    print("done")


if __name__ == "__main__":
    main()
