"""Pallas bilateral depth filter.

The preprocessing bilateral filter (``cv::cuda::bilateralFilter`` in the
reference, ``src/core/EMFusion.cpp:296-298``) is a k x k stencil — a
perfect fit for a VMEM-resident Pallas kernel: the whole 640x480 depth
image (1.2 MB) sits in VMEM and the taps are ``pltpu.roll`` shifts, so
the entire filter runs on the VPU with zero HBM round-trips between taps
(the XLA fallback builds a 49-operand fused graph of dynamic slices).

Boundary semantics: taps are rolled (wrap-around) but wrapped
contributions are masked out, matching zero-padding rather than the
reference's OpenCV reflect-101 border — a (kernel//2)-pixel border band
difference on an image whose borders the pipeline erodes anyway
(``Params.boundary``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(depth_ref, out_ref, *, ks: int, sigma_depth: float,
            sigma_spatial: float, H: int, W: int):
    r = ks // 2
    inv2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv2sd = 1.0 / (2.0 * sigma_depth * sigma_depth)
    d = depth_ref[:]
    Hp, Wp = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)

    def roll(x, sh, axis):
        # pltpu.roll requires a non-negative shift; rolling by -k is
        # rolling by (size - k)
        return pltpu.roll(x, sh % x.shape[axis], axis)

    for dy in range(-r, r + 1):
        rolled_y = roll(d, -dy, 0)
        ok_y = (rows + dy >= 0) & (rows + dy < H)
        for dx in range(-r, r + 1):
            shifted = roll(rolled_y, -dx, 1)
            ok = ok_y & (cols + dx >= 0) & (cols + dx < W)
            dv = shifted - d
            w = jnp.exp(-(dx * dx + dy * dy) * inv2ss - dv * dv * inv2sd)
            w = jnp.where(ok & (shifted > 0), w, 0.0)
            num = num + w * shifted
            den = den + w
    out_ref[:] = jnp.where(den > 0, num / den, 0.0)


@functools.partial(jax.jit, static_argnames=("kernel_size", "sigma_depth",
                                             "sigma_spatial", "interpret"))
def bilateral_filter_pallas(depth: jnp.ndarray, kernel_size: int = 7,
                            sigma_depth: float = 0.04,
                            sigma_spatial: float = 4.5,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`geometry.camera.bilateral_filter` (zero-pad
    borders instead of reflect-101; see module docstring)."""
    H, W = depth.shape
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    dpad = jnp.pad(jnp.asarray(depth, jnp.float32),
                   ((0, Hp - H), (0, Wp - W)))
    kern = functools.partial(_kernel, ks=kernel_size,
                             sigma_depth=sigma_depth,
                             sigma_spatial=sigma_spatial, H=H, W=W)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dpad)
    return out[:H, :W]
