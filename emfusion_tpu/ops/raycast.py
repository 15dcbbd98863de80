"""Volume raycasting as a vectorized masked ray-march.

TPU-native redesign of ``kernel_raycastTSDF`` (``src/core/cuda/TSDF.cu:
466-601``). The CUDA kernel runs an independent variable-length while-loop
per ray; on TPU we march *all* rays in lock-step inside one
``lax.while_loop`` whose state is whole-image arrays with per-ray active
masks — each iteration is a fused elementwise pass plus two trilinear
gathers, and the loop exits when every ray has terminated. Per-ray adaptive
step sizes (truncdist -> voxel -> half-voxel near the surface) are kept
exactly as in the reference, as are the zero-crossing interpolation of
``t*``, the back-face early-out and all boundary margins.

Layouts are component-first for TPU tiling: directions and outputs are
(3, H, W); the gradient volume is (3, Z, Y, X).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from emfusion_tpu.geometry.sampling import trilinear_sample, \
    trilinear_sample_channels


def _safe_dir(d):
    return jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)


def _enter_exit_steps(dirs: jnp.ndarray, campos: jnp.ndarray,
                      box_bounds: jnp.ndarray):
    """Slab test: ray parameter where the ray enters / exits the volume AABB
    (``TSDF.cuh:31-63``). dirs: (3, ...); campos/box_bounds: (3,)."""
    d = _safe_dir(dirs)
    lo = jnp.where(d > 0, -box_bounds[:, None, None], box_bounds[:, None, None])
    hi = jnp.where(d > 0, box_bounds[:, None, None], -box_bounds[:, None, None])
    t_enter = jnp.max((lo - campos[:, None, None]) / d, axis=0)
    t_exit = jnp.min((hi - campos[:, None, None]) / d, axis=0)
    return t_enter, t_exit


class _MarchState(NamedTuple):
    raylength: jnp.ndarray
    raystep: jnp.ndarray
    tsdf: jnp.ndarray
    active: jnp.ndarray
    hit: jnp.ndarray
    t_star: jnp.ndarray
    it: jnp.ndarray


def raycast_volume(tsdf_vol: jnp.ndarray, grads_vol: jnp.ndarray,
                   weights_vol: jnp.ndarray, rel_rot_co: jnp.ndarray,
                   rel_trans_co: jnp.ndarray, intr: jnp.ndarray,
                   voxel_size, truncdist, height: int, width: int,
                   max_steps: int = 2048,
                   prev_raylengths: jnp.ndarray | None = None):
    """Raycast one TSDF volume into a camera.

    Args:
      tsdf_vol, weights_vol: (Z, Y, X); grads_vol: (3, Z, Y, X).
      rel_rot_co / rel_trans_co: camera-to-object (volume) transform.
      prev_raylengths: optional (H, W) — rays never march past a nonzero
        previous hit (cross-volume composite rule, ``TSDF.cu:496-500``).

    Returns dict with ``raylengths`` (t* where hit else 0), ``vertices``
    and ``normals`` (3, H, W) in camera coordinates, and boolean ``mask``
    (H, W).
    """
    Z, Y, X = tsdf_vol.shape
    resx = jnp.float32(X)
    resy = jnp.float32(Y)
    resz = jnp.float32(Z)
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    vs = voxel_size
    td = truncdist

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    ux = jnp.broadcast_to((xs[None, :] - cx) / fx, (height, width))
    uy = jnp.broadcast_to((ys[:, None] - cy) / fy, (height, width))
    unproj = jnp.stack([ux, uy, jnp.ones((height, width), jnp.float32)],
                       axis=0)                                   # (3, H, W)
    ray = jnp.einsum("ij,jhw->ihw", rel_rot_co, unproj)
    norm = jnp.sqrt(jnp.sum(ray * ray, axis=0, keepdims=True))
    dirs = ray / norm
    campos = rel_trans_co
    box = jnp.stack([(resx - 1.0) / 2.0 * vs, (resy - 1.0) / 2.0 * vs,
                     (resz - 1.0) / 2.0 * vs])

    t_enter, t_exit = _enter_exit_steps(dirs, campos, box)
    raylength = t_enter + vs
    max_raylength = t_exit - vs
    if prev_raylengths is not None:
        max_raylength = jnp.where(prev_raylengths != 0.0,
                                  jnp.minimum(prev_raylengths, max_raylength),
                                  max_raylength)
    alive = raylength < max_raylength

    def grid_at(t):
        """Returns per-axis fractional grid coords (vx, vy, vz) at ray
        parameter t (H, W)."""
        vx = (campos[0] + dirs[0] * t) / vs + (resx - 1.0) / 2.0
        vy = (campos[1] + dirs[1] * t) / vs + (resy - 1.0) / 2.0
        vz = (campos[2] + dirs[2] * t) / vs + (resz - 1.0) / 2.0
        return vx, vy, vz

    def inside(v3, margin):
        vx, vy, vz = v3
        return ((vx >= 0.0) & (vx + margin < resx)
                & (vy >= 0.0) & (vy + margin < resy)
                & (vz >= 0.0) & (vz + margin < resz))

    # --- phase 1: skip forward until inside the sampling bounds (margin 1)
    # at truncdist steps (``TSDF.cu:509-514``).
    def skip_cond(state):
        t, it = state
        need = alive & ~inside(grid_at(t), 1.0) & (t < max_raylength)
        return jnp.any(need) & (it < max_steps)

    def skip_body(state):
        t, it = state
        need = alive & ~inside(grid_at(t), 1.0) & (t < max_raylength)
        return (jnp.where(need, t + td, t), it + 1)

    raylength, _ = jax.lax.while_loop(skip_cond, skip_body,
                                      (raylength, jnp.int32(0)))

    v0 = grid_at(raylength)
    v0_ok = inside(v0, 1.0)
    tsdf0 = trilinear_sample(tsdf_vol, *v0, v0_ok)
    raystep = jnp.full_like(raylength, td)
    raystep = jnp.where(jnp.abs(tsdf0) < 1.0, vs, raystep)
    raystep = jnp.where(jnp.abs(tsdf0) < 0.8, 0.5 * vs, raystep)

    # --- phase 2: main march (``TSDF.cu:523-572``)
    def cond(s: _MarchState):
        return jnp.any(s.active) & (s.it < max_steps)

    def body(s: _MarchState):
        t_new = jnp.where(s.active, s.raylength + s.raystep, s.raylength)
        in_budget = t_new <= max_raylength
        still = s.active & in_budget
        v = grid_at(t_new)
        inb = inside(v, 2.0)
        do_sample = still & inb

        next_tsdf = trilinear_sample(tsdf_vol, *v, do_sample)
        w = trilinear_sample(weights_vol, *v, do_sample)

        backface = do_sample & (s.tsdf < 0) & (next_tsdf > 0) & (w > 0)

        step_new = jnp.where(do_sample & (jnp.abs(next_tsdf) < 1.0), vs,
                             s.raystep)
        step_new = jnp.where(do_sample & (jnp.abs(next_tsdf) < 0.8), 0.5 * vs,
                             step_new)
        # backface breaks before the step update in the reference
        step_new = jnp.where(backface, s.raystep, step_new)

        crossing = do_sample & ~backface & (s.tsdf > 0) & (next_tsdf < 0)
        denom = next_tsdf - s.tsdf
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        ts = t_new - step_new * s.tsdf / denom
        vstar = grid_at(ts)
        vstar_inb = inside(vstar, 2.0)
        wstar = trilinear_sample(weights_vol, *vstar,
                                 crossing & vstar_inb)
        hit_now = crossing & vstar_inb & (wstar > 0)

        # ``continue`` on out-of-bounds v* skips the tsdf update
        skip_update = crossing & ~vstar_inb
        tsdf_upd = do_sample & ~backface & ~skip_update
        tsdf_new = jnp.where(tsdf_upd, next_tsdf, s.tsdf)

        active_new = s.active & in_budget & ~backface & ~hit_now
        return _MarchState(
            raylength=t_new,
            raystep=step_new,
            tsdf=tsdf_new,
            active=active_new,
            hit=s.hit | hit_now,
            t_star=jnp.where(hit_now, ts, s.t_star),
            it=s.it + 1,
        )

    init = _MarchState(raylength=raylength, raystep=raystep, tsdf=tsdf0,
                       active=alive, hit=jnp.zeros_like(alive),
                       t_star=jnp.zeros_like(raylength), it=jnp.int32(0))
    final = jax.lax.while_loop(cond, body, init)

    hit = final.hit
    t_star = final.t_star
    vstar = grid_at(t_star)
    grad = trilinear_sample_channels(grads_vol, *vstar, hit)   # (3, H, W)
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0, keepdims=True))
    grad = grad / jnp.where(gnorm > 0, gnorm, 1.0)

    # convert to camera coordinates: rot_OC = rot_CO^T (``TSDF.cu:562-564``)
    verts_obj = dirs * t_star[None]
    vertices = jnp.einsum("ji,jhw->ihw", rel_rot_co, verts_obj)
    normals = jnp.einsum("ji,jhw->ihw", rel_rot_co, grad)
    hitf = hit[None]
    return {
        "raylengths": jnp.where(hit, t_star, 0.0),
        "vertices": jnp.where(hitf, vertices, 0.0),
        "normals": jnp.where(hitf, normals, 0.0),
        "mask": hit,
    }
