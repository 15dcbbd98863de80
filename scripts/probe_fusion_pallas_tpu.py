"""Validate + time the Pallas fusion kernel on the real TPU."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.ops.fusion import integrate_tsdf
    from emfusion_tpu.ops.pallas.fusion_pallas import integrate_tsdf_pallas

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=10, warmup=2):
        for _ in range(warmup):
            sync(fn(*args)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out[0])
        return (time.perf_counter() - t0) / iters

    H, W = 480, 640
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = jnp.asarray((1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
                         ).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    th = np.deg2rad(20)
    rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))

    # --- correctness at 64^3 vs jnp (on-TPU jnp is slow; 64^3 ok) -------
    R = 64
    voxel = 5.12 / R
    tsdf = jnp.asarray((rng.rand(R, R, R) * 2 - 1).astype(np.float32))
    wts = jnp.asarray((rng.rand(R, R, R) * 3).astype(np.float32))
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))
    t0 = time.perf_counter()
    try:
        t_pal, w_pal = integrate_tsdf_pallas(tsdf, wts, depth, assoc, rot,
                                             tr, intr, voxel, 10 * voxel,
                                             64.0)
        sync(t_pal)
        print(f"64^3 pallas compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"PALLAS FAIL: [{type(e).__name__}] "
              f"{str(e)[:500]}", flush=True)
        return
    t_ref, w_ref = integrate_tsdf(tsdf, wts, depth, assoc, rot, tr, intr,
                                  voxel, 10 * voxel, 64.0)
    d = (np.abs(np.asarray(t_pal) - np.asarray(t_ref)) > 1e-4).mean()
    dw = (np.abs(np.asarray(w_pal) - np.asarray(w_ref)) > 1e-4).mean()
    print(f"64^3 mismatch vs jnp: tsdf {d:.6f} weights {dw:.6f}", flush=True)

    # --- timing at 256^3 and 512^3 --------------------------------------
    for R in (256, 512):
        voxel = 5.12 / R
        tsdf = jnp.zeros((R, R, R), jnp.float32)
        wts = jnp.zeros((R, R, R), jnp.float32)
        fn = lambda t, w: integrate_tsdf_pallas(
            t, w, depth, assoc, rot, tr, intr, voxel, 10 * voxel, 64.0)
        t0 = time.perf_counter()
        out = fn(tsdf, wts)
        sync(out[0])
        print(f"{R}^3 compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        dt = timeit(fn, tsdf, wts, iters=10)
        nbytes = R ** 3 * 4 * 4  # r+w of tsdf & weights
        print(f"{R}^3 pallas fuse: {dt*1e3:.2f} ms -> {1/dt:.1f} fps "
              f"({nbytes/dt/1e9:.0f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
