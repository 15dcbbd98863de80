"""Probe: while_loop with genuinely loop-carried gather indices.

probe_lm_parts shows every LM piece is fast standalone, yet track_volume
runs at ~18 ms/iter. Difference: in the real loop the pose (hence every
gather index) depends on the previous iteration. This probe feeds the
do_eval result back into the pose so nothing can be hoisted, at the same
shapes (512^3 volume, N=34240).
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    from emfusion_tpu.geometry.sampling import (
        sample_system_at_points, sample_volume_at_points)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def timeit(fn, *args, iters=5, warmup=2):
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

    R = 512
    voxel = 5.12 / R
    vol = jnp.asarray(rng.rand(R, R, R).astype(np.float32))
    wvol = jnp.asarray(rng.rand(R, R, R).astype(np.float32))
    N = 34_240
    pts = jnp.asarray(
        (rng.rand(3, N).astype(np.float32) - 0.5) * 2.0
        + np.array([[0], [0], [1.5]], np.float32))
    assoc = jnp.asarray(rng.rand(N).astype(np.float32))
    K = 20

    def do_eval(v, w, p, a, Rm, t):
        psi, g3 = sample_system_at_points(v, p, Rm, t, voxel)
        pw = Rm @ p + t[:, None]
        J = jnp.concatenate([g3, jnp.cross(pw, g3, axis=0)], axis=0)
        intw = sample_volume_at_points(w, p, Rm, t, voxel, margin=1)
        hub = jnp.minimum(0.2 / jnp.maximum(jnp.abs(psi), 1e-30), 1.0)
        intw = jnp.minimum(intw, 64.0)
        ww = hub * intw / jnp.maximum(jnp.max(intw), 1e-30) * a
        Jw = J * ww[None, :]
        return Jw @ J.T, Jw @ psi

    # A: while_loop, pose depends on previous A,b (like real LM)
    def loop_dep(v, w, p, a):
        def body(c):
            i, Rm, t = c
            A, b = do_eval(v, w, p, a, Rm, t)
            t2 = t + 1e-12 * b[:3]
            Rm2 = Rm + 1e-12 * A[:3, :3]
            return i + 1, Rm2, t2
        Rm0 = jnp.eye(3, dtype=jnp.float32)
        t0 = jnp.asarray(np.array([0, 0, -2.0], np.float32))
        return jax.lax.while_loop(lambda c: c[0] < K, body, (jnp.int32(0),
                                                             Rm0, t0))
    f = jax.jit(loop_dep)
    dt = timeit(f, vol, wvol, pts, assoc)
    print(f"while_loop {K}x do_eval (loop-carried pose): {dt*1e3:.1f} ms "
          f"({dt*1e3/K:.2f} ms/iter)", flush=True)

    # B: same body, lax.cond(True) wrapped — isolates cond overhead
    def loop_cond(v, w, p, a):
        def body(c):
            i, Rm, t = c
            A, b = jax.lax.cond(
                i < 1000,
                lambda _: do_eval(v, w, p, a, Rm, t),
                lambda _: (jnp.zeros((6, 6)), jnp.zeros((6,))),
                None)
            t2 = t + 1e-12 * b[:3]
            Rm2 = Rm + 1e-12 * A[:3, :3]
            return i + 1, Rm2, t2
        Rm0 = jnp.eye(3, dtype=jnp.float32)
        t0 = jnp.asarray(np.array([0, 0, -2.0], np.float32))
        return jax.lax.while_loop(lambda c: c[0] < K, body, (jnp.int32(0),
                                                             Rm0, t0))
    f2 = jax.jit(loop_cond)
    dt = timeit(f2, vol, wvol, pts, assoc)
    print(f"while_loop {K}x cond(do_eval): {dt*1e3:.1f} ms "
          f"({dt*1e3/K:.2f} ms/iter)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
