"""r5 probe: where do the fused-step 11 ms go?  Times the stage-1 warp
and the slice kernel separately on the bench operating point, plus MXU
peak calibration for the kernel's matmul shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        o = fn(*args)
    sync(o[0] if isinstance(o, tuple) else o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    sync(o[0] if isinstance(o, tuple) else o)
    return (time.perf_counter() - t0) / iters


R = 512
H, W = 480, 640
voxel = 5.12 / R
trunc = 10 * voxel
intr = jnp.asarray(np.array(
    [[525.0, 0, W / 2 - 0.5], [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
    np.float32))
ys, xs = np.mgrid[0:H, 0:W]
depth = (1.5 + 0.2 * np.sin(xs / 11.0) * np.cos(ys / 7.0)).astype(np.float32)
depth_j = jnp.asarray(depth)
assoc = jnp.ones((H, W), jnp.float32)
vdt = jnp.bfloat16
tsdf = jnp.zeros((R, R, R), vdt)
weights = jnp.zeros((R, R, R), vdt)
th = np.deg2rad(15)
rel_rot = jnp.asarray(np.array(
    [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
     [-np.sin(th), 0, np.cos(th)]], np.float32))
rel_trans = jnp.asarray(np.array([0, 0, 2.56], np.float32))

from emfusion_tpu.ops.fusion_pencil import (
    _pencil_setup, _window_from_quad, _split_bf16)
from emfusion_tpu.ops.pallas.fusion_pencil_pallas import (
    integrate_tsdf_pencil_pallas)
from emfusion_tpu.ops.pallas.warp_pallas import warp_image_to_grid_pallas

# --- full current path -------------------------------------------------
@jax.jit
def fuse_step(tsdf, weights):
    return integrate_tsdf_pencil_pallas(
        tsdf, weights, depth_j, assoc, rel_rot, rel_trans, intr,
        voxel, trunc, 64.0)

t_full = timeit(lambda t, w: fuse_step(t, w)[:2], tsdf, weights)
print(f"full fuse_step:        {t_full*1e3:8.2f} ms")

# --- stage-1 warp only -------------------------------------------------
SB = int(-(-int(H * 1.25) // 8) * 8)
LB = int(-(-int(W * 1.25) // 128) * 128)
SA = max(8, (SB // 2 + 7) // 8 * 8)
LA = max(128, (LB // 2 + 127) // 128 * 128)
Z = Y = X = R


@jax.jit
def warp_only(depth, assoc):
    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        rel_rot, rel_trans, intr, voxel, Z, Y, X)
    a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=X, Y=Y)
    D_B = warp_image_to_grid_pallas(depth, Bmat, H, W, a0, b0, da, db,
                                    SB, LB)
    A_B = warp_image_to_grid_pallas(assoc, Bmat, H, W, a0, b0, da, db,
                                    SA, LA)
    return D_B, A_B

t_warp = timeit(warp_only, depth_j, assoc)
print(f"stage-1 warps only:    {t_warp*1e3:8.2f} ms")

# --- MXU peak calibration on kernel-like shapes -----------------------
a = jnp.ones((608, 896), jnp.bfloat16)
b = jnp.ones((896, 512), jnp.bfloat16)
c = jnp.ones((512, 608), jnp.bfloat16)


@jax.jit
def mm_chain(a, b, c):
    t = jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jnp.dot(c, t.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

t_mm = timeit(mm_chain, a, b, c, iters=50)
macs = 608 * 896 * 512 + 512 * 608 * 512
print(f"XLA matmul chain {t_mm*1e6:7.1f} us -> "
      f"{2*macs/t_mm/1e12:6.1f} TFLOP/s")
