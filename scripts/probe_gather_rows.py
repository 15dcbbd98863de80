"""Probe: is a gather of short contiguous X-rows cheaper than scalar takes?

The tracking sampler needs a 3x3x3 neighborhood per point. Along X the
three corners are CONTIGUOUS, so the 27 scalar gathers can be expressed
as 9 gathers of 3-element rows (lax.gather slice_sizes=(1,1,3)). If XLA's
TPU gather loop costs per-row rather than per-element, that is a 3x cut
on the LM hot path. Also probes 8-wide and 128-wide rows to map the
cost(row_len) curve, and a take_along_axis sublane variant.

Run: setsid nohup python scripts/probe_gather_rows.py > /tmp/probe_rows.log 2>&1 &
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def timeit(fn, *args, iters=10, warmup=2):
        import jax
        def sync(o):
            # axon relay: block_until_ready is not a real barrier; force a
            # scalar device->host transfer
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jnp.asarray(leaf).ravel()[0])
        import jax.numpy as jnp
        for _ in range(warmup):
            out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    import os
    Z = Y = X = int(os.environ.get("EMF_PROBE_RES", 256))
    vol = jnp.asarray(rng.rand(Z, Y, X).astype(np.float32))
    print(f"volume {Z}^3", flush=True)
    N = 34_240  # 160*214, the stride-3 tracking point count

    zi = rng.randint(0, Z - 4, N).astype(np.int32)
    yi = rng.randint(0, Y - 4, N).astype(np.int32)
    xi = rng.randint(0, X - 4, N).astype(np.int32)

    # baseline: 27 scalar takes from the flat volume
    flat = vol.reshape(-1)
    base = jnp.asarray((zi * Y + yi) * X + xi)

    @jax.jit
    def scalar27(flat, base):
        acc = 0.0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    acc = acc + jnp.take(flat, base + (dz * Y + dy) * X + dx)
        return acc

    dt = timeit(scalar27, flat, base)
    print(f"27x scalar take: {dt*1e3:.2f} ms "
          f"({27*N/dt/1e9:.3f} G elem/s)", flush=True)

    # 9 row-gathers of 3 contiguous X elements via lax.gather
    import jax.lax as lax
    starts = jnp.stack([jnp.asarray(zi), jnp.asarray(yi), jnp.asarray(xi)],
                       axis=1)  # (N, 3)

    def rowgather(vol, starts, row):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2))
        return lax.gather(vol, starts, dn, slice_sizes=(1, 1, row),
                          mode="clip")

    for row in (3, 8, 128):
        fn = jax.jit(lambda v, s, row=row: sum(
            rowgather(v, s + jnp.asarray([dz, dy, 0], jnp.int32)[None],
                      row).sum(-1)
            for dz in range(3) for dy in range(3)))
        try:
            dt = timeit(fn, vol, starts)
            print(f"9x row-gather len={row}: {dt*1e3:.2f} ms "
                  f"(eff {27*N/dt/1e9:.3f} G useful-elem/s, "
                  f"{9*N/dt/1e6:.1f} M rows/s)", flush=True)
        except Exception as e:
            print(f"row={row} FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # single big row per point: gather (1,4,128) brick rows
    def brickgather(vol, starts):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return lax.gather(vol, starts, dn, slice_sizes=(3, 3, 8),
                          mode="clip")

    fn = jax.jit(lambda v, s: brickgather(v, s).sum((1, 2, 3)))
    try:
        dt = timeit(fn, vol, starts)
        print(f"1x brick-gather (3,3,8): {dt*1e3:.2f} ms "
              f"({N/dt/1e6:.1f} M bricks/s)", flush=True)
    except Exception as e:
        print(f"brick FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    # dynamic_slice in a scanned loop (per-point DMA analogue)
    print("done", flush=True)


if __name__ == "__main__":
    main()
