"""Why is preprocess 8.8 s/frame on TPU? Isolate transfer vs bilateral."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.geometry.camera import (bilateral_filter,
                                              preprocess_depth,
                                              backproject_depth)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    H, W = 480, 640
    rng = np.random.RandomState(0)
    depth_np = (1.0 + rng.rand(H, W)).astype(np.float32)

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])

    # H2D transfer
    t0 = time.perf_counter()
    for _ in range(5):
        d = jnp.asarray(depth_np)
    sync(d)
    print(f"H2D 1.2MB x5: {(time.perf_counter()-t0)*1e3/5:.1f} ms each",
          flush=True)

    bf = jax.jit(lambda x: bilateral_filter(x, 7, 0.04, 4.5))
    t0 = time.perf_counter()
    out = bf(d)
    sync(out)
    print(f"bilateral compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = bf(d)
    sync(out)
    print(f"bilateral steady: {(time.perf_counter()-t0)*1e3/5:.1f} ms",
          flush=True)

    pp = jax.jit(lambda x: preprocess_depth(x, 7, 0.04, 4.5))
    t0 = time.perf_counter()
    out = pp(d)
    sync(out)
    print(f"preprocess_depth compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = pp(jnp.asarray(depth_np))
    sync(out)
    print(f"preprocess_depth steady (incl H2D): "
          f"{(time.perf_counter()-t0)*1e3/5:.1f} ms", flush=True)

    intr = jnp.asarray(np.array([[525.0, 0, 319.5], [0, 525.0, 239.5],
                                 [0, 0, 1]], np.float32))

    full = jax.jit(lambda x: backproject_depth(pp(x), intr))
    t0 = time.perf_counter()
    out = full(d)
    sync(out)
    print(f"preprocess+backproject compile+run: "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = full(jnp.asarray(depth_np))
    sync(out)
    print(f"preprocess+backproject steady: "
          f"{(time.perf_counter()-t0)*1e3/5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
