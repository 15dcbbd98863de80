"""Probe: device-only cost of gather variants via a carried 20x loop.

The axon relay adds ~24 ms RPC floor per synced call, so each variant
runs inside a while_loop whose indices depend on the previous result
(nothing hoistable); cost/iter = (t_total - floor) / 20.

Variants at 512^3, N=34240 points:
  a) 27 scalar flat takes (current sampler's pattern)
  b) 9 row-gathers of 8 contiguous X elems (lax.gather slice (1,1,8))
  c) 1 brick-gather (3,3,8) per point
  d) 8 scalar takes (psi-only pattern)
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    def timeit(fn, *args, iters=5, warmup=2):
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    Z = Y = X = 512
    K = 20
    vol = jnp.asarray(rng.rand(Z, Y, X).astype(np.float32))
    N = 34_240
    zi = jnp.asarray(rng.randint(0, Z - 8, N).astype(np.int32))
    yi = jnp.asarray(rng.randint(0, Y - 8, N).astype(np.int32))
    xi = jnp.asarray(rng.randint(0, X - 8, N).astype(np.int32))

    # RPC floor
    f0 = jax.jit(lambda a: a + 1.0)
    floor = timeit(f0, jnp.float32(0))
    print(f"RPC floor: {floor*1e3:.1f} ms", flush=True)

    def carried(body):
        """20x loop; indices perturbed by previous sum (always +0 at
        runtime, but not provably zero to XLA: ``acc`` is a sum of
        non-negative gathers only at runtime, so ``min(acc, 0)`` cannot
        be algebraically folded and the gathers stay inside the loop)."""
        def fn(vol, zi, yi, xi):
            def step(c):
                i, acc = c
                pert = jnp.minimum(acc, 0.0).astype(jnp.int32)
                s = body(vol, zi + pert, yi, xi)
                return i + 1, acc + s
            return lax.while_loop(lambda c: c[0] < K, step,
                                  (jnp.int32(0), jnp.float32(0)))
        return jax.jit(fn)

    flat = vol.reshape(-1)

    def scalar_n(n_corners):
        def body(vol, zi, yi, xi):
            base = (zi * Y + yi) * X + xi
            acc = 0.0
            c = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        if c < n_corners:
                            acc = acc + jnp.take(
                                flat, base + (dz * Y + dy) * X + dx).sum()
                            c += 1
            return acc
        return body

    def rows9(vol, zi, yi, xi):
        starts = jnp.stack([zi, yi, xi], axis=1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2))
        acc = 0.0
        for dz in range(3):
            for dy in range(3):
                o = jnp.asarray([dz, dy, 0], jnp.int32)[None]
                acc = acc + lax.gather(vol, starts + o, dn,
                                       slice_sizes=(1, 1, 8),
                                       mode="clip").sum()
        return acc

    def brick(vol, zi, yi, xi):
        starts = jnp.stack([zi, yi, xi], axis=1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return lax.gather(vol, starts, dn, slice_sizes=(3, 3, 8),
                          mode="clip").sum()

    for name, body in [("27 scalar takes", scalar_n(27)),
                       ("8 scalar takes", scalar_n(8)),
                       ("9x row-gather (1,1,8)", rows9),
                       ("1x brick-gather (3,3,8)", brick)]:
        try:
            fn = carried(body)
            dt = timeit(fn, vol, zi, yi, xi)
            per = (dt - floor) / K
            print(f"{name}: {per*1e3:.2f} ms/iter (total {dt*1e3:.0f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
