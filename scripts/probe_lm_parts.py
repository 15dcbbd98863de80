"""Probe: decompose the 18 ms/iter LM tracking cost at 512^3.

Raw flat takes are fast (~20 G elem/s, probe_gather_rows), yet
track_volume measures ~18 ms/iter — so the cost is elsewhere: the
eval_system chain, the 6x6 solve, se3 log/exp, or while_loop structure.
Times each piece as a standalone jitted program.
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
    from emfusion_tpu.geometry.se3 import se3_exp, se3_log

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def timeit(fn, *args, iters=20, warmup=3):
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
    Rm = jnp.eye(3, dtype=jnp.float32)
    t = jnp.asarray(np.array([0, 0, -2.0], np.float32))

    # 1. fused 27-corner system sample
    f1 = jax.jit(lambda v, p, Rm, t: sample_system_at_points(
        v, p, Rm, t, voxel))
    dt = timeit(f1, vol, pts, Rm, t)
    print(f"sample_system (27-corner): {dt*1e3:.2f} ms", flush=True)

    # 2. psi-only 8-corner sample
    f2 = jax.jit(lambda v, p, Rm, t: sample_volume_at_points(
        v, p, Rm, t, voxel, margin=1))
    dt = timeit(f2, vol, pts, Rm, t)
    print(f"sample_volume (8-corner): {dt*1e3:.2f} ms", flush=True)

    # 3. full do_eval chain: system + weights sample + normal eqs
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
    f3 = jax.jit(do_eval)
    dt = timeit(f3, vol, wvol, pts, assoc, Rm, t)
    print(f"do_eval chain: {dt*1e3:.2f} ms", flush=True)

    # 4. solve + se3 log/exp (N-free scalar part)
    A = jnp.asarray(rng.rand(6, 6).astype(np.float32)) + 6 * jnp.eye(6)
    b = jnp.asarray(rng.rand(6).astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32)

    def scalar_part(A, b, pose):
        x = jnp.linalg.solve(A + 0.1 * jnp.eye(6, dtype=jnp.float32), b)
        rv = se3_log(pose)
        dT = se3_exp(-x)
        return dT[:3, :3] @ pose[:3, :3], jnp.linalg.norm(rv) + x.sum()
    f4 = jax.jit(scalar_part)
    dt = timeit(f4, A, b, pose)
    print(f"6x6 solve + se3 log/exp: {dt*1e3:.2f} ms", flush=True)

    # 5. while_loop of 20 dummy iterations doing only the system sample
    def loop_fn(v, p, Rm, t):
        def body(c):
            i, acc = c
            psi, g3 = sample_system_at_points(v, p, Rm + 0.0 * acc, t, voxel)
            return i + 1, acc + psi.sum() + g3.sum()
        return jax.lax.while_loop(lambda c: c[0] < 20, body,
                                  (jnp.int32(0), jnp.float32(0)))
    f5 = jax.jit(loop_fn)
    dt = timeit(f5, vol, pts, Rm, t, iters=5)
    print(f"while_loop 20x system sample: {dt*1e3:.2f} ms "
          f"({dt*1e3/20:.2f} ms/iter)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
