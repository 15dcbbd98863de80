"""Probe 2: which gather forms does Mosaic (Pallas TPU) support, and how
fast are they? Also: XLA take_along_axis(axis=0) at scale.

The design of the fusion/raycast/tracking kernels hinges on a fast
"sublane dynamic gather": out[k, l] = src[idx[k, l], l]. This is the only
cross-lane-free gather the VPU can do; everything else must be built from
it (transposes for lane gathers, two-pass warps for 2-D gathers).
"""
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

    S, L = 512, 512
    src = jnp.asarray(rng.rand(S, L).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, S, (S, L)).astype(np.int32))

    def try_pallas(name, kern, inputs, out_shape, ref_fn):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*inputs)
            ref = ref_fn(*[np.asarray(x) for x in inputs])
            ok = np.allclose(np.asarray(out), ref)
            print(f"{name}: COMPILES, correct={ok}")
            return ok
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name}: FAILS [{type(e).__name__}] {msg}")
            return False

    # P1: take_along_axis axis=0 (sublane gather)
    ok_p1 = try_pallas(
        "P1 take_along_axis(axis=0)",
        lambda s, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(s[:], i[:], axis=0)),
        [src, idx0], (S, L),
        lambda s, i: np.take_along_axis(s, i, axis=0))

    # P2: axis=1
    try_pallas(
        "P2 take_along_axis(axis=1)",
        lambda s, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(s[:], i[:], axis=1)),
        [src, idx0], (S, L),
        lambda s, i: np.take_along_axis(s, np.clip(i, 0, L - 1), axis=1))

    # P3: row gather with 1-D index (same row set for all lanes)
    idx1d = jnp.asarray(rng.randint(0, S, (S,)).astype(np.int32))
    try_pallas(
        "P3 take(rows, 1D idx, axis=0)",
        lambda s, i, o: o.__setitem__(
            slice(None), jnp.take(s[:], i[:], axis=0)),
        [src, idx1d], (S, L),
        lambda s, i: np.take(s, i, axis=0))

    # P4: gather smaller output than table
    idx_small = jnp.asarray(rng.randint(0, S, (8, L)).astype(np.int32))
    try_pallas(
        "P4 take_along_axis(axis=0), K<S",
        lambda s, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(s[:], i[:], axis=0)),
        [src, idx_small], (8, L),
        lambda s, i: np.take_along_axis(s, i, axis=0))

    if not ok_p1:
        print("sublane gather unsupported -> matmul-gather fallback needed")
        return

    # --- timing: grid of sublane gathers, fusion-like volume of work ----
    # 256 programs x (512, 512) gather = 67M gathered elements
    G = 256

    def kern(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    big_src = jnp.asarray(rng.rand(G * S, L).astype(np.float32))
    big_idx = jnp.asarray(rng.randint(0, S, (G * S, L)).astype(np.int32))

    gathered = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * S, L), jnp.float32),
    )
    jit_g = jax.jit(lambda s, i: gathered(s, i))
    dt = timeit(jit_g, big_src, big_idx)
    n = G * S * L
    print(f"pallas sublane gather {n/1e6:.0f}M elems: {dt*1e3:.3f} ms -> "
          f"{n/dt/1e9:.1f} G gathers/s")

    # compare: XLA (non-pallas) take_along_axis axis=0, same volume
    xla_g = jax.jit(lambda s, i: jnp.take_along_axis(
        s.reshape(G, S, L), i.reshape(G, S, L) , axis=1).reshape(G * S, L))
    dt = timeit(xla_g, big_src, big_idx)
    print(f"XLA batched take_along_axis same work: {dt*1e3:.3f} ms -> "
          f"{n/dt/1e9:.2f} G gathers/s")

    # --- transpose cost (needed for lane gathers) -----------------------
    tr = jax.jit(lambda s: s.reshape(G, S, L).swapaxes(1, 2).reshape(
        G * L, S) * 1.0)
    dt = timeit(tr, big_src)
    print(f"transpose {n/1e6:.0f}M elems: {dt*1e3:.3f} ms "
          f"({n*8/dt/1e9:.0f} GB/s)")

    # --- matmul-gather trick at brick scale (raycast fallback) ----------
    # weights (N=1024, S=1024) @ brick (S=1024, L=128)
    N, Sb, Lb = 1024, 1024, 128
    W = jnp.asarray(rng.rand(N, Sb).astype(np.float32))
    brick = jnp.asarray(rng.rand(Sb, Lb).astype(np.float32))
    mm = jax.jit(lambda w, b: w @ b)
    dt = timeit(mm, W, brick, iters=50)
    print(f"weight-matmul gather ({N}x{Sb}x{Lb}): {dt*1e6:.0f} us")

    # one-hot build cost at same scale
    rows = jnp.asarray(rng.randint(0, Sb, (N, 1)).astype(np.int32))

    @jax.jit
    def onehot_mm(r, b):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (N, Sb), 1) == r
              ).astype(jnp.float32)
        return oh @ b

    dt = timeit(onehot_mm, rows, brick, iters=50)
    print(f"onehot-build + matmul gather: {dt*1e6:.0f} us")


if __name__ == "__main__":
    main()
