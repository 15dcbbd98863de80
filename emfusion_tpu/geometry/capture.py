"""Per-point neighborhood capture + algebraic (tent-product) resampling.

TPU-native redesign of the LM tracking sampler. The reference samples
the TSDF/weight volumes afresh every LM iteration
(``kernel_getVolumeVals`` / ``kernel_computePoseGradients``,
``src/core/cuda/TSDF.cu:603-726``) — free on a GPU with hardware
gather, but on TPU XLA lowers arbitrary gathers to a scalar loop
(~0.1-0.7 G elem/s measured on v5e), making the per-iteration 27-corner
gather the dominant per-frame cost.

Redesign: gather each tracking point's **6x6x6 voxel neighborhood once**
(the only gather), then evaluate every LM iteration's trilinear samples
*algebraically* from the cache with separable tent (hat) weights:

    trilerp(vol, v) == sum_d cache[d] * tent(v_local - d),
    tent(t) = max(0, 1 - |t|)

which is exact whenever ``v_local`` stays inside the cached window —
pure VPU work (~a few hundred FMA/point/iteration), no gather. The LM
pose drifts during iterations; a cheap arithmetic *drift check* detects
any relevant point leaving its window and triggers a re-capture (the
anchors re-center at the current pose). The 6^3 window gives -2/+1
voxels of drift margin for the gradient (system) samples and -2/+2 for
value samples around the capture pose.

Layout: caches are ``(C, 6, 6, 6, N)`` — points on the minor (lane)
axis, window dims on sublanes (6 -> 8 padding only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from emfusion_tpu.geometry.sampling import _transform_to_grid

WIN = 6          # cached window size per axis
_ANCHOR_OFF = 2  # anchor = floor(v) - _ANCHOR_OFF -> v_local in [2, 3)


def capture_neighborhoods(vols: jnp.ndarray, points_cam: jnp.ndarray,
                          rel_rot: jnp.ndarray, rel_trans: jnp.ndarray,
                          voxel_size):
    """Gather the WIN^3 neighborhood of every point at the given pose.

    Args:
      vols: stacked channel-first volumes (C, Z, Y, X) — e.g.
        ``[tsdf, weights]`` (+ fg-prob for object volumes).
      points_cam: (3, N) camera-space points.

    Returns ``(cache, anchor)`` with ``cache`` (C, WIN, WIN, WIN, N)
    f32 and ``anchor`` (3, N) int32 (x, y, z minimum corner indices,
    *unclipped*; cell gathers clip to the volume like the direct
    samplers, so cached values equal what the gather path would read
    for any pose whose coords stay in-window).
    """
    C, Z, Y, X = vols.shape
    N = points_cam.shape[1]
    vx, vy, vz, _ = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                       voxel_size, (Z, Y, X))
    ax = jnp.floor(vx).astype(jnp.int32) - _ANCHOR_OFF
    ay = jnp.floor(vy).astype(jnp.int32) - _ANCHOR_OFF
    az = jnp.floor(vz).astype(jnp.int32) - _ANCHOR_OFF
    anchor = jnp.stack([ax, ay, az])

    d = jnp.arange(WIN, dtype=jnp.int32)
    zc = jnp.clip(az[None, :] + d[:, None], 0, Z - 1)      # (W, N)
    yc = jnp.clip(ay[None, :] + d[:, None], 0, Y - 1)
    xc = jnp.clip(ax[None, :] + d[:, None], 0, X - 1)

    if X % 8 != 0 or X < 16:
        # small/odd volumes: plain scalar-take path
        flat = ((zc[:, None, None, :] * Y + yc[None, :, None, :]) * X
                + xc[None, None, :, :]).reshape(-1)        # (W, W, W, N)
        cache = jnp.stack(
            [jnp.take(vols[c].reshape(-1), flat).astype(jnp.float32)
             for c in range(C)])
        return cache.reshape(C, WIN, WIN, WIN, N), anchor

    # ---- chunked-row gather (TPU production path) --------------------
    # XLA:TPU's scalar gather runs at ~0.075 G elem/s (measured, r3), so
    # the 2ch x 6^3 x N element take costs ~200 ms at N=34k. Gathering
    # 8-wide ALIGNED x-chunks instead runs at ~160 M rows/s (measured):
    # each (z, y) row of a point's window needs x in [b, b+8) with
    # b = clip(ax, 0, X-8), always covered by the two aligned 8-chunks
    # starting at 8*c0, c0 = clip(b >> 3, 0, X/8 - 2). The 6 taps are
    # then selected from the 16 gathered lanes on the VPU (16-way
    # select), never touching HBM again. ~6x fewer gather descriptors:
    # 2*36*N rows vs 2*216*N scalars.
    X8 = X // 8
    base = jnp.clip(ax, 0, X - 8)                          # (N,)
    c0 = jnp.clip(base // 8, 0, X8 - 2)
    row = (zc[:, None, :] * Y + yc[None, :, :]) * X8       # (W, W, N)
    r0 = row + c0[None, None, :]
    ridx = jnp.stack([r0, r0 + 1], axis=-1).reshape(-1)    # (W*W*N*2,)
    # per-tap lane offset within the 16 gathered lanes
    xoff = xc - 8 * c0[None, :]                            # (W, N) in [0,16)
    caches = []
    for c in range(C):
        g = jnp.take(vols[c].reshape(Z * Y * X8, 8), ridx, axis=0)
        g = g.astype(jnp.float32).reshape(WIN, WIN, N, 16)
        out = jnp.zeros((WIN, WIN, WIN, N), jnp.float32)
        for k in range(16):
            sel = (xoff == k)                              # (W, N)
            out = out + jnp.where(sel[None, None, :, :],
                                  g[:, :, None, :, k], 0.0)
        caches.append(out)
    return jnp.stack(caches), anchor


def capture_neighborhoods_batched(vols: jnp.ndarray,
                                  points_cam: jnp.ndarray,
                                  rel_rot: jnp.ndarray,
                                  rel_trans: jnp.ndarray,
                                  voxel_size: jnp.ndarray):
    """Batched-over-objects capture: ONE flat chunked-row gather over
    the stacked object volumes.

    ``vmap(capture_neighborhoods)`` would lower each object's takes as
    a separate batched gather; offsetting the flat row indices by the
    object's table base keeps the whole pool a single take (the gather
    cost is per descriptor — one launch for K x C x 36 x M rows).

    Args:
      vols: (K, C, Z, Y, X) stacked per-object channel volumes.
      points_cam: (K, 3, M); rel_rot (K, 3, 3); rel_trans (K, 3);
      voxel_size (K,).

    Returns (cache (K, C, WIN, WIN, WIN, M) f32, anchor (K, 3, M)).
    Requires X % 8 == 0 and X >= 16 (object grids are 64^3).
    """
    K, C, Z, Y, X = vols.shape
    M = points_cam.shape[2]
    assert X % 8 == 0 and X >= 16, "batched capture needs lane-aligned X"

    def grid_coords(p, R, t, vs):
        return _transform_to_grid(p, R, t, vs, (Z, Y, X))

    vx, vy, vz, _ = jax.vmap(grid_coords)(points_cam, rel_rot,
                                          rel_trans, voxel_size)
    ax = jnp.floor(vx).astype(jnp.int32) - _ANCHOR_OFF      # (K, M)
    ay = jnp.floor(vy).astype(jnp.int32) - _ANCHOR_OFF
    az = jnp.floor(vz).astype(jnp.int32) - _ANCHOR_OFF
    anchor = jnp.stack([ax, ay, az], axis=1)                # (K, 3, M)

    d = jnp.arange(WIN, dtype=jnp.int32)
    zc = jnp.clip(az[:, None] + d[None, :, None], 0, Z - 1)  # (K, W, M)
    yc = jnp.clip(ay[:, None] + d[None, :, None], 0, Y - 1)
    xc = jnp.clip(ax[:, None] + d[None, :, None], 0, X - 1)

    X8 = X // 8
    base = jnp.clip(ax, 0, X - 8)
    c0 = jnp.clip(base // 8, 0, X8 - 2)                      # (K, M)
    # flat row index into the stacked (K*C*Z*Y*X8, 8) table
    kofs = (jnp.arange(K, dtype=jnp.int32) * C)[:, None, None, None]
    row = (zc[:, :, None, :] * Y + yc[:, None, :, :]) * X8   # (K,W,W,M)
    xoff = xc - 8 * c0[:, None, :]                           # (K, W, M)

    table = vols.reshape(K * C * Z * Y * X8, 8)
    caches = []
    # per-tap lane one-hot: the x-tap select over the 16 gathered lanes
    # runs as ONE einsum (exact: each output sums exactly one nonzero
    # product). A slice-per-lane loop makes XLA materialize size-1-
    # minor-dim intermediates that lane-pad 128x (1.12 GB each, K=16).
    oh = (xoff[..., None] ==
          jnp.arange(16, dtype=jnp.int32)).astype(jnp.float32)
    for c in range(C):
        r0 = (kofs + c) * (Z * Y * X8) + row + c0[:, None, None, :]
        ridx = jnp.stack([r0, r0 + 1], axis=-1).reshape(-1)
        g = jnp.take(table, ridx, axis=0)
        g = g.astype(jnp.float32).reshape(K, WIN, WIN, M, 16)
        out = jnp.einsum("kzyml,kxml->kzyxm", g, oh,
                         preferred_element_type=jnp.float32)
        caches.append(out)
    return jnp.stack(caches, axis=1), anchor


def _tents(vl: jnp.ndarray) -> jnp.ndarray:
    """(WIN, N) hat-function weights: tent(vl - d)."""
    d = jnp.arange(WIN, dtype=jnp.float32)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(vl[None, :] - d))


def _local_coords(anchor, points_cam, rel_rot, rel_trans, voxel_size,
                  shape):
    Z, Y, X = shape
    vx, vy, vz, pz = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                        voxel_size, (Z, Y, X))
    lx = vx - anchor[0].astype(jnp.float32)
    ly = vy - anchor[1].astype(jnp.float32)
    lz = vz - anchor[2].astype(jnp.float32)
    return (vx, vy, vz, pz), (lx, ly, lz)


def out_of_window_count(anchor, points_cam, rel_rot, rel_trans,
                        voxel_size, shape):
    """Number of RELEVANT points whose local coords fall outside the
    cached windows at this pose (these contribute nothing until the
    next re-capture; surfaced in track stats so budget exhaustion under
    fast motion is observable — EMF_TRACK_STATS)."""
    Z, Y, X = shape
    (vx, vy, vz, pz), (lx, ly, lz) = _local_coords(
        anchor, points_cam, rel_rot, rel_trans, voxel_size, shape)
    rel = (pz > 0) & (vx >= -1) & (vy >= -1) & (vz >= -1) \
        & (vx < X) & (vy < Y) & (vz < Z)
    bad = ~_window_ok(lx, ly, lz)
    return jnp.sum((rel & bad).astype(jnp.int32))


def drift_ok(anchor, points_cam, rel_rot, rel_trans, voxel_size, shape,
             tol: float = 0.01):
    """True iff (almost) every *relevant* point's local coords allow
    both value and (+1-shifted) system sampling from the cache: vl in
    [0, WIN-2] per axis. Relevant = in front of the camera and within
    one voxel of the volume (points far outside never contribute —
    masked to zero by the samplers' validity — and must not force
    re-captures).

    ``tol``: fraction of relevant points allowed outside their windows
    before a re-capture fires. A capture costs a streaming volume pass
    (or a large gather); a handful of frustum-edge outliers crossing
    their window boundary after a sub-voxel pose step used to trigger
    a full re-capture per LM step (measured: the camera LM burned its
    whole budget every frame). Out-of-window points contribute nothing
    meanwhile (the samplers' ``_window_ok`` masks them)."""
    Z, Y, X = shape
    (vx, vy, vz, pz), (lx, ly, lz) = _local_coords(
        anchor, points_cam, rel_rot, rel_trans, voxel_size, shape)
    rel = (pz > 0) & (vx >= -1) & (vy >= -1) & (vz >= -1) \
        & (vx < X) & (vy < Y) & (vz < Z)
    hi = WIN - 2.0
    bad = (lx < 0) | (lx > hi) | (ly < 0) | (ly > hi) \
        | (lz < 0) | (lz > hi)
    nrel = jnp.maximum(jnp.sum(rel.astype(jnp.float32)), 1.0)
    nbad = jnp.sum((rel & bad).astype(jnp.float32))
    return nbad <= tol * nrel


def _window_ok(lx, ly, lz):
    """Local coords (incl. the +1-shifted system tents) stay inside
    the cached window. Under the drift check this always holds; when
    re-captures are capped (TrackConfig.max_recaptures) drifted points
    drop out here instead of silently losing tent mass."""
    hi = WIN - 2.0
    return ((lx >= 0) & (lx <= hi) & (ly >= 0) & (ly <= hi)
            & (lz >= 0) & (lz <= hi))


def sample_value_from_cache(cache: jnp.ndarray, anchor, points_cam,
                            rel_rot, rel_trans, voxel_size, shape,
                            margin: int = 1) -> jnp.ndarray:
    """Cache equivalent of ``sample_volume_at_points`` (same validity
    semantics). ``cache`` (C, W, W, W, N) -> (C, N)."""
    Z, Y, X = shape
    (vx, vy, vz, pz), (lx, ly, lz) = _local_coords(
        anchor, points_cam, rel_rot, rel_trans, voxel_size, shape)
    valid = (pz > 0) & (vx >= 0.0) & (vy >= 0.0) & (vz >= 0.0) \
        & (vx + margin < X) & (vy + margin < Y) & (vz + margin < Z) \
        & _window_ok(lx, ly, lz)
    tx = _tents(lx)
    ty = _tents(ly)
    tz = _tents(lz)
    cx = jnp.sum(cache * tx[None, None, None], axis=3)      # (C,W,W,N)
    cy = jnp.sum(cx * ty[None, None], axis=2)               # (C,W,N)
    out = jnp.sum(cy * tz[None], axis=1)                    # (C,N)
    return jnp.where(valid[None], out, 0.0)


def sample_system_from_cache(cache_t: jnp.ndarray, anchor, points_cam,
                             rel_rot, rel_trans, voxel_size, shape):
    """Cache equivalent of ``sample_system_at_points``: residual psi
    (margin-1 validity) and finite-difference gradient (margin-2, with
    the per-shift validity of the direct sampler). ``cache_t`` is the
    TSDF channel (W, W, W, N). Returns (psi, g3)."""
    Z, Y, X = shape
    (vx, vy, vz, pz), (lx, ly, lz) = _local_coords(
        anchor, points_cam, rel_rot, rel_trans, voxel_size, shape)

    tx, tx1 = _tents(lx), _tents(lx + 1.0)
    ty, ty1 = _tents(ly), _tents(ly + 1.0)
    tz, tz1 = _tents(lz), _tents(lz + 1.0)

    cx = jnp.sum(cache_t * tx[None, None], axis=2)          # (W, W, N)
    cx1 = jnp.sum(cache_t * tx1[None, None], axis=2)
    cy = jnp.sum(cx * ty[None], axis=1)                     # (W, N)
    cy1 = jnp.sum(cx * ty1[None], axis=1)
    cy_x1 = jnp.sum(cx1 * ty[None], axis=1)

    base_val = jnp.sum(cy * tz, axis=0)                     # (N,)
    sx = jnp.sum(cy_x1 * tz, axis=0)
    sy = jnp.sum(cy1 * tz, axis=0)
    sz = jnp.sum(cy * tz1, axis=0)

    inside = (pz > 0) & (vx >= 0.0) & (vy >= 0.0) & (vz >= 0.0) \
        & _window_ok(lx, ly, lz)
    valid1 = inside & (vx + 1 < X) & (vy + 1 < Y) & (vz + 1 < Z)
    valid2 = inside & (vx + 2 < X) & (vy + 2 < Y) & (vz + 2 < Z)
    psi = jnp.where(valid1, base_val, 0.0)
    base = jnp.where(valid2, base_val, 0.0)

    def vld(ex, ey, ez):
        return ((pz > 0)
                & (vx + ex >= 0.0) & (vy + ey >= 0.0) & (vz + ez >= 0.0)
                & (vx + ex + 2 < X) & (vy + ey + 2 < Y)
                & (vz + ez + 2 < Z))

    sx = jnp.where(vld(1, 0, 0), sx, 0.0)
    sy = jnp.where(vld(0, 1, 0), sy, 0.0)
    sz = jnp.where(vld(0, 0, 1), sz, 0.0)
    g3 = jnp.stack([sx - base, sy - base, sz - base], axis=0) / voxel_size
    return psi, g3
