"""Round-2 probe: Pallas pencil-fusion kernel on the real TPU.

Times integrate_tsdf_pencil_pallas at the reference operating point
(512^3, 640x480) vs the XLA pencil path, plus x_block variants.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        import os
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    from emfusion_tpu.ops.pallas.fusion_pencil_pallas import (
        integrate_tsdf_pencil_pallas)

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    R = 512
    H, W = 480, 640
    voxel = 5.12 / R
    trunc = 10 * voxel
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = jnp.asarray((1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
                         ).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    tsdf = jnp.zeros((R, R, R))
    wts = jnp.zeros((R, R, R))
    th = np.deg2rad(15)
    rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    # correctness vs XLA pencil on-device first
    f_ref = jax.jit(lambda t, w: integrate_tsdf_pencil(
        t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0))
    t0 = time.perf_counter()
    tr_ref, wr_ref = f_ref(tsdf, wts)
    sync(tr_ref)
    print(f"xla pencil compile+run: {time.perf_counter()-t0:.1f}s")

    for xb in (0, 256, 128):
        name = f"pallas xb={xb or 512}"
        try:
            f_pal = jax.jit(lambda t, w, xb=xb: integrate_tsdf_pencil_pallas(
                t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0,
                x_block=xb))
            t0 = time.perf_counter()
            tp, wp = f_pal(tsdf, wts)
            sync(tp)
            print(f"{name} compile+run: {time.perf_counter()-t0:.1f}s")
            d = float(jnp.max(jnp.abs(tp - tr_ref)))
            dw = float(jnp.max(jnp.abs(wp - wr_ref)))
            print(f"{name} maxdiff tsdf={d:.2e} w={dw:.2e}")
            dt = timeit(f_pal, tsdf, wts, iters=10)
            print(f"{name}: {dt*1e3:.2f} ms ({1.0/dt:.1f} fps)")
        except Exception as e:
            print(f"{name}: FAILS [{type(e).__name__}] {str(e)[:300]}")

    dt = timeit(f_ref, tsdf, wts, iters=10)
    print(f"xla pencil: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
