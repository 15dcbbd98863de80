"""Probe 3: pin down exact working dynamic_gather invocations + speed."""
import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=10, warmup=2):
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    def run(name, shape, axis, mode):
        S, L = shape
        src = jnp.asarray(rng.rand(S, L).astype(np.float32))
        hi = S if axis == 0 else L
        idx = jnp.asarray(rng.randint(0, hi, (S, L)).astype(np.int32))

        def kern(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=axis,
                                           mode=mode)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(src, idx)
            ref = np.take_along_axis(np.asarray(src), np.asarray(idx),
                                     axis=axis)
            ok = np.allclose(np.asarray(out), ref)
            print(f"{name} {shape} axis={axis} mode={mode}: OK correct={ok}")
            return True
        except Exception as e:
            msg = str(e).replace("\n", " ")[-160:]
            print(f"{name} {shape} axis={axis} mode={mode}: FAIL "
                  f"[{type(e).__name__}] ...{msg}")
            return False

    results = {}
    for axis in (0, 1):
        for shape in ((8, 128), (64, 128), (256, 128), (512, 512),
                      (480, 640), (1024, 128), (8, 256)):
            results[(shape, axis)] = run("g", shape, axis,
                                         "promise_in_bounds")
    run("g", (256, 128), 0, "fill")

    good = [k for k, v in results.items() if v]
    if not good:
        return

    # timing: biggest working shape, grid loop for volume
    shape, axis = max(good, key=lambda k: k[0][0] * k[0][1])
    S, L = shape
    G = max(1, (64 * 1024 * 1024) // (S * L))  # ~64M elements of work

    def kern(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=axis,
                                       mode="promise_in_bounds")

    src = jnp.asarray(rng.rand(G * S, L).astype(np.float32))
    hi = S if axis == 0 else L
    idx = jnp.asarray(rng.randint(0, hi, (G * S, L)).astype(np.int32))
    call = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * S, L), jnp.float32),
    )
    jit_g = jax.jit(call)
    dt = timeit(jit_g, src, idx)
    n = G * S * L
    print(f"pallas dynamic_gather axis={axis} {n/1e6:.0f}M: {dt*1e3:.3f} ms "
          f"-> {n/dt/1e9:.1f} G/s")

    # same-shape repeated gather inside one kernel (VMEM-resident loop)
    REP = 16

    def kern_rep(s_ref, i_ref, o_ref):
        acc = jnp.zeros_like(s_ref[:])
        for r in range(REP):
            acc = acc + jnp.take_along_axis(
                s_ref[:], jnp.bitwise_xor(i_ref[:], r), axis=axis,
                mode="promise_in_bounds")
        o_ref[:] = acc

    call2 = pl.pallas_call(
        kern_rep,
        grid=(G,),
        in_specs=[pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * S, L), jnp.float32),
    )
    jit2 = jax.jit(call2)
    dt = timeit(jit2, src, idx)
    print(f"pallas {REP}x gather in-VMEM: {dt*1e3:.3f} ms -> "
          f"{n*REP/dt/1e9:.1f} G/s (compute-only rate)")


if __name__ == "__main__":
    main()
