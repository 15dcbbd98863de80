"""Camera model + depth preprocessing.

Replaces ``cuda::EMFusion::computePoints`` (``src/core/cuda/EMFusion.cu:29-61``)
and ``EMFusion::preprocessDepth`` (``src/core/EMFusion.cpp:294-305``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def backproject_depth(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Depth image (H, W) -> camera-space point map, component-first
    (3, H, W) — a trailing 3-axis would be padded to 128 lanes on TPU.

    Matches ``kernel_computePoints``: p = ((x-cx)/fx*d, (y-cy)/fy*d, d).
    Pixels with depth 0 map to (0, 0, 0) which downstream code treats as
    invalid (z <= 0 guard).
    """
    H, W = depth.shape
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    xs = jnp.arange(W, dtype=depth.dtype)
    ys = jnp.arange(H, dtype=depth.dtype)
    u = (xs[None, :] - cx) / fx
    v = (ys[:, None] - cy) / fy
    return jnp.stack([u * depth, v * depth, depth], axis=0)


def project_points(points: jnp.ndarray, intr: jnp.ndarray):
    """Camera-space points (3, ...) -> (px, py int arrays, z).

    Rounds to nearest like ``__float2int_rn`` in the CUDA kernels.
    """
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    z = points[2]
    zsafe = jnp.where(z > 0, z, 1.0)
    px = jnp.round(points[0] * fx / zsafe + cx).astype(jnp.int32)
    py = jnp.round(points[1] * fy / zsafe + cy).astype(jnp.int32)
    return px, py, z


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def bilateral_filter(depth: jnp.ndarray, kernel_size: int = 7,
                     sigma_depth: float = 0.04,
                     sigma_spatial: float = 4.5) -> jnp.ndarray:
    """Bilateral filter on a depth image, KinectFusion-style.

    Equivalent of ``cv::cuda::bilateralFilter`` as used by the reference
    (``src/core/EMFusion.cpp:296-298``): Gaussian spatial kernel of given
    size and Gaussian range kernel on depth differences. Implemented as a
    dense stack of shifted images so XLA fuses it into one fused elementwise
    pass (no gathers).
    """
    r = kernel_size // 2
    inv2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv2sd = 1.0 / (2.0 * sigma_depth * sigma_depth)
    # reflect-101 padding like OpenCV BORDER_DEFAULT
    pad = jnp.pad(depth, r, mode="reflect")
    H, W = depth.shape
    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(pad, (r + dy, r + dx), (H, W))
            dv = shifted - depth
            w = jnp.exp(-(dx * dx + dy * dy) * inv2ss - dv * dv * inv2sd)
            w = jnp.where(shifted > 0, w, 0.0)
            num = num + w * shifted
            den = den + w
    return jnp.where(den > 0, num / den, 0.0)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def preprocess_depth(depth_raw: jnp.ndarray, kernel_size: int = 7,
                     sigma_depth: float = 0.04,
                     sigma_spatial: float = 4.5) -> jnp.ndarray:
    """Bilateral-filter + invalid-pixel patching.

    Mirrors ``EMFusion::preprocessDepth``: NaN results and pixels whose raw
    depth is 0 are set to 0.
    """
    depth = bilateral_filter(depth_raw, kernel_size, sigma_depth,
                             sigma_spatial)
    depth = jnp.where(jnp.isnan(depth), 0.0, depth)
    depth = jnp.where(depth_raw == 0.0, 0.0, depth)
    return depth
