"""Time the pencil fusion path on the real TPU at reference scale."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    from emfusion_tpu.ops.fusion import compute_gradients

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])

    H, W = 480, 640
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    ys, xs = np.mgrid[0:H, 0:W]
    depth = jnp.asarray((1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
                         ).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    th = np.deg2rad(15)
    rot = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    for R, oversample in ((256, 1.5), (512, 1.5), (512, 1.0)):
        voxel = 5.12 / R
        tsdf = jnp.zeros((R, R, R), jnp.float32)
        wts = jnp.zeros((R, R, R), jnp.float32)

        def fn(t, w):
            return integrate_tsdf_pencil(t, w, depth, assoc, rot, tr, intr,
                                         voxel, 10 * voxel, 64.0,
                                         oversample=oversample)

        t0 = time.perf_counter()
        out = fn(tsdf, wts)
        sync(out[0])
        print(f"{R}^3 os={oversample} compile+run: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(2):
            out = fn(tsdf, wts)
        sync(out[0])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = fn(tsdf, wts)
        sync(out[0])
        dt = (time.perf_counter() - t0) / iters
        bw = R ** 3 * 4 * 4 / dt / 1e9
        print(f"{R}^3 os={oversample} pencil fuse: {dt*1e3:.2f} ms -> "
              f"{1/dt:.1f} fps ({bw:.0f} GB/s eff)", flush=True)

    # gradients at 512^3 (the other fusion-stage kernel)
    R = 512
    g = jax.jit(compute_gradients)
    tsdf = out[0]
    for _ in range(2):
        o = g(tsdf)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = g(tsdf)
    sync(o)
    dt = (time.perf_counter() - t0) / 5
    print(f"512^3 gradients: {dt*1e3:.2f} ms "
          f"({R**3*4*4/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
