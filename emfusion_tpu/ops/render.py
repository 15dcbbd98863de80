"""Phong rendering of composited vertex/normal maps.

TPU equivalent of ``kernel_renderPhong``/``renderGPU``
(``src/core/cuda/EMFusion.cu:100-186``): pure elementwise map.
"""

from __future__ import annotations

import colorsys

import jax.numpy as jnp
import numpy as np


def make_colormap(seed: int = 6893) -> np.ndarray:
    """Deterministic 256-entry id->RGB colormap; id 0 is white
    (structure of ``EMFusion::randomColors``, ``src/core/EMFusion.cpp:
    614-633``; exact shuffle order differs from the OpenCV RNG)."""
    rng = np.random.RandomState(seed)
    cmap = np.zeros((256, 3), dtype=np.uint8)
    hues = np.arange(1, 256) / 256.0
    rng.shuffle(hues)
    for i, h in enumerate(hues, start=1):
        r, g, b = colorsys.hsv_to_rgb(h, 1.0, 1.0)
        cmap[i] = (int(r * 255), int(g * 255), int(b * 255))
    cmap[0] = (255, 255, 255)
    return cmap


def render_phong(vertices: jnp.ndarray, normals: jnp.ndarray,
                 segmentation: jnp.ndarray, colormap: jnp.ndarray,
                 light_pos=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Phong-shade composited maps.

    vertices/normals: component-first (3, H, W) camera frame;
    segmentation: (H, W) int ids; colormap: (256, 3) uint8.
    Returns (H, W, 3) uint8.
    Coefficients match the reference: ka=.3, kd=.5, ks=.2, alpha=20.
    """
    ka, kd, ks, alpha = 0.3, 0.5, 0.2, 20
    p = jnp.moveaxis(vertices, 0, -1)
    n = jnp.moveaxis(normals, 0, -1)
    valid = jnp.any(p != 0.0, axis=-1)

    colors = jnp.take(jnp.asarray(colormap, dtype=jnp.float32) / 255.0,
                      segmentation.astype(jnp.int32), axis=0)

    light = jnp.asarray(light_pos, dtype=jnp.float32)
    l = light - p
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
    pv = -p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    ndotl = jnp.sum(n * l, axis=-1, keepdims=True)
    r = 2.0 * ndotl * n - l
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
    rdotv = jnp.sum(r * pv, axis=-1, keepdims=True)

    intensity = ka * 1.0 + kd * colors * ndotl + ks * 1.0 * rdotv ** alpha
    img = jnp.clip(intensity * 255.0, 0.0, 255.0)
    img = jnp.where(valid[..., None], img, 0.0)
    return img.astype(jnp.uint8)
