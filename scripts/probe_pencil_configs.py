"""TPU probe: pencil fusion cost decomposition across configs.

One process, several jitted variants of the 512^3 bench operating point:
  full f32 | full bf16-split | half-grid | windowed ladder
Separates MAC cost vs one-hot-matrix HBM traffic vs elementwise floor.
Run detached: setsid nohup python scripts/probe_pencil_configs.py > log &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    R = int(os.environ.get("EMF_PROBE_RES", 512))
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
    weights = jnp.zeros((R, R, R))
    th = np.deg2rad(15)
    rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    def timeit(fn, iters=10):
        out = fn(tsdf, weights)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(tsdf, weights)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    variants = {
        "full_f32": dict(windowed=False),
        "full_bf16": dict(windowed=False, bf16=True),
        "halfgrid_f32": dict(windowed=False, grid=(304, 448)),
        "windowed_f32": dict(windowed=True),
    }
    for name, kw in variants.items():
        fn = jax.jit(lambda t, w, kw=kw: integrate_tsdf_pencil(
            t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0, **kw))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(tsdf, weights))
        c = time.perf_counter() - t0
        dt = timeit(fn)
        print(f"{name:14s}: {dt * 1e3:7.2f} ms  (compile {c:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
