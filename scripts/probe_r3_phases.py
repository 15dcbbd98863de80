"""Round-3 probe: isolated per-phase costs at the production operating
point, to attribute the 996 ms e2e frame (VERDICT r2 item 1).

Measures on the real TPU:
  1. raycast_sweep 512^3 (f32 vs bf16 resample matmuls);
  2. object-side fusion (XLA pencil, 64^3, grid 256x256) x1 / x4 slots;
  3. preprocess (Pallas bilateral + backproject);
  4. capture gather variants at N=34k (stride-3 tracking points):
     current scalar take vs (1,1,8)-row-slice lax.gather (+ numerics
     parity);
  5. host fetch RTT of a small packed vector.

Run: timeout 580 python scripts/probe_r3_phases.py
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


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    out0 = out[0] if isinstance(out, tuple) else out
    if isinstance(out0, dict):
        out0 = next(iter(out0.values()))
    sync(out0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out0 = out[0] if isinstance(out, tuple) else out
    if isinstance(out0, dict):
        out0 = next(iter(out0.values()))
    sync(out0)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    R = 512
    H, W = 480, 640
    voxel = 5.12 / R
    trunc = 10 * voxel
    idx = np.arange(R, dtype=np.float32) - (R - 1) / 2
    zz = idx[:, None, None] * voxel
    tsdf_np = np.clip((zz - 0.3) / trunc, -1, 1).astype(np.float32) \
        * np.ones((R, R, R), np.float32)
    tsdf_j = jnp.asarray(tsdf_np)
    w_j = jnp.ones((R, R, R), jnp.float32) * 10
    intr = jnp.asarray(np.array(
        [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    Rm = jnp.eye(3, dtype=jnp.float32)
    tv = jnp.asarray(np.array([0.0, 0.0, -2.56], np.float32))

    # ---- 5. host fetch RTT -------------------------------------------
    small = jnp.zeros((64,), jnp.float32)
    f_id = jax.jit(lambda x: x + 1.0)
    dt = timeit(lambda x: np.asarray(f_id(x))[0], small, iters=20)
    print(f"fetch RTT (64 f32 + trivial op): {dt*1e3:.2f} ms", flush=True)

    # ---- 1. raycast sweep --------------------------------------------
    from emfusion_tpu.ops.raycast_sweep import raycast_sweep
    for bf16 in (() if os.environ.get("EMF_SKIP_DONE") else (False, True)):
        f = jax.jit(lambda t, w: raycast_sweep(
            t, w, Rm, tv, intr, voxel, trunc, H, W, bf16=bf16)
            ["raylengths"])
        dt = timeit(f, tsdf_j, w_j, iters=5)
        print(f"raycast_sweep 512^3 bf16={bf16}: {dt*1e3:.2f} ms",
              flush=True)

    # ---- 2. object fusion (XLA pencil 64^3) --------------------------
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    depth = jnp.asarray(
        (2.3 + 0.1 * rng.rand(H, W)).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    ot = jnp.zeros((64, 64, 64), jnp.float32)
    ow = jnp.zeros((64, 64, 64), jnp.float32)
    for K in (() if os.environ.get("EMF_SKIP_DONE") else (1, 4)):
        def obj_fuse(t, w):
            def one(t1, w1):
                return integrate_tsdf_pencil(
                    t1, w1, depth, assoc, Rm, tv, intr, 0.01, 0.1, 64.0,
                    bf16=False, grid=(256, 256), windowed=False)
            return jax.vmap(one)(t, w)
        f = jax.jit(obj_fuse)
        tK = jnp.broadcast_to(ot, (K, 64, 64, 64))
        wK = jnp.broadcast_to(ow, (K, 64, 64, 64))
        dt = timeit(f, tK, wK, iters=5)
        print(f"obj fusion (XLA pencil 64^3, grid 256x256) x{K}: "
              f"{dt*1e3:.2f} ms", flush=True)

    f = jax.jit(lambda t, w: raycast_sweep(
        jnp.zeros((64, 64, 64), jnp.float32) + t[0, 0, 0] * 0, w, Rm, tv,
        intr, 0.01, 0.1, H, W, grid=(256, 256))["raylengths"])
    ot64 = jnp.zeros((64, 64, 64), jnp.float32)
    f2 = jax.jit(lambda t, w: raycast_sweep(
        t, w, Rm, tv, intr, 0.01, 0.1, H, W, grid=(256, 256))
        ["raylengths"])
    dt = timeit(f2, ot64, ot64, iters=10)
    print(f"obj raycast_sweep 64^3 grid 256x256: {dt*1e3:.2f} ms",
          flush=True)

    # ---- 3. preprocess ------------------------------------------------
    from emfusion_tpu.ops.pallas.bilateral_pallas import \
        bilateral_filter_pallas
    f = jax.jit(lambda d: bilateral_filter_pallas(d, 7, 4.5, 0.04))
    dt = timeit(f, depth, iters=10)
    print(f"bilateral pallas 640x480 k7: {dt*1e3:.2f} ms", flush=True)

    # ---- 4. capture variants ------------------------------------------
    from emfusion_tpu.geometry.capture import capture_neighborhoods, WIN
    ys, xs = np.mgrid[0:H, 0:W]
    d_np = (2.3 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)
            ).astype(np.float32)
    pts_full = np.stack([(xs - 319.5) / 525.0 * d_np,
                         (ys - 239.5) / 525.0 * d_np, d_np], 0
                        ).astype(np.float32)
    pts = jnp.asarray(pts_full[:, ::3, ::3].reshape(3, -1))
    N = pts.shape[1]
    vols = jnp.stack([tsdf_j, w_j])
    print(f"capture N={N}", flush=True)

    cap = jax.jit(lambda v_, p_, R_, t_: capture_neighborhoods(
        v_, p_, R_, t_, voxel))
    dt = timeit(cap, vols, pts, Rm, tv, iters=3)
    print(f"capture current (scalar take): {dt*1e3:.2f} ms", flush=True)
    ref_cache, ref_anchor = jax.tree.map(np.asarray, cap(vols, pts, Rm, tv))

    # (1,1,8)-slice gather: 36 row-slices per point, minor dim contiguous
    from emfusion_tpu.geometry.sampling import _transform_to_grid
    from jax import lax

    def capture_rows(vols, pts, R_, t_):
        C, Z, Y, X = vols.shape
        vx, vy, vz, _ = _transform_to_grid(pts, R_, t_, voxel, (Z, Y, X))
        ax = jnp.floor(vx).astype(jnp.int32) - 2
        ay = jnp.floor(vy).astype(jnp.int32) - 2
        az = jnp.floor(vz).astype(jnp.int32) - 2
        d = jnp.arange(WIN, dtype=jnp.int32)
        zc = jnp.clip(az[None, :] + d[:, None], 0, Z - 1)   # (W, N)
        yc = jnp.clip(ay[None, :] + d[:, None], 0, Y - 1)
        xs0 = jnp.clip(ax, 0, X - 8)                        # (N,)
        # starts (W, W, N, 3) -> (W*W*N, 3)
        starts = jnp.stack([
            jnp.broadcast_to(zc[:, None, :], (WIN, WIN, N)),
            jnp.broadcast_to(yc[None, :, :], (WIN, WIN, N)),
            jnp.broadcast_to(xs0[None, None, :], (WIN, WIN, N)),
        ], axis=-1).reshape(-1, 3)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2))
        outs = []
        for c in range(C):
            g = lax.gather(vols[c], starts, dn, slice_sizes=(1, 1, 8))
            outs.append(g.reshape(WIN, WIN, N, 8))
        rows = jnp.stack(outs)                    # (C, W, W, N, 8)
        # extract the 6 in-window x values: window col j is at
        # clip(ax+j) - xs0 within the 8-wide row
        xc = jnp.clip(ax[None, :] + d[:, None], 0, X - 1)   # (W, N)
        off = (xc - xs0[None, :])                           # (W, N) 0..7
        sel = (jnp.arange(8)[None, None, :] ==
               off[:, :, None]).astype(jnp.float32)         # (W, N, 8)
        cache = jnp.einsum("cabnk,xnk->caxbn", rows.astype(jnp.float32),
                           sel)
        # reorder: rows is (C, dz, dy, N, 8); want (C, dz, dy, dx, N)
        return cache.transpose(0, 1, 3, 2, 4), jnp.stack([ax, ay, az])

    capr = jax.jit(capture_rows)
    try:
        dt = timeit(capr, vols, pts, Rm, tv, iters=3)
        c2, a2 = jax.tree.map(np.asarray, capr(vols, pts, Rm, tv))
        ok = np.allclose(c2, ref_cache) and np.array_equal(a2, ref_anchor)
        print(f"capture row-slice(1,1,8): {dt*1e3:.2f} ms parity={ok}",
              flush=True)
    except Exception as e:
        print(f"capture row-slice FAILED: {type(e).__name__}: {e}",
              flush=True)

    # flat 2-D rows: reshape (Z*Y, X), take full rows then slice x?
    def capture_take36(vols, pts, R_, t_):
        C, Z, Y, X = vols.shape
        v2 = vols.reshape(C, Z * Y, X)
        vx, vy, vz, _ = _transform_to_grid(pts, R_, t_, voxel, (Z, Y, X))
        ax = jnp.floor(vx).astype(jnp.int32) - 2
        ay = jnp.floor(vy).astype(jnp.int32) - 2
        az = jnp.floor(vz).astype(jnp.int32) - 2
        d = jnp.arange(WIN, dtype=jnp.int32)
        zc = jnp.clip(az[None, :] + d[:, None], 0, Z - 1)
        yc = jnp.clip(ay[None, :] + d[:, None], 0, Y - 1)
        rows_idx = (zc[:, None, :] * Y + yc[None, :, :]).reshape(-1)
        xs0 = jnp.clip(ax, 0, X - 8)
        starts = jnp.stack([
            rows_idx,
            jnp.broadcast_to(xs0[None, :], (WIN * WIN, N)).reshape(-1),
        ], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        outs = [lax.gather(v2[c], starts, dn, slice_sizes=(1, 8))
                for c in range(C)]
        return jnp.stack(outs)

    cap36 = jax.jit(capture_take36)
    try:
        dt = timeit(cap36, vols, pts, Rm, tv, iters=3)
        print(f"capture 2d-rows(1,8): {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"capture 2d-rows FAILED: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
