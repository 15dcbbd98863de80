"""MXU-native TSDF fusion via the homography-pencil factorization.

Equivalent of ``kernel_updateTSDF`` (``src/core/cuda/TSDF.cu:327-427``),
reformulated for TPU. Measured facts that force the design (v5e):
XLA's general gather runs at ~0.11 G elem/s (scalar loop) — 134M per-voxel
depth lookups would take seconds — and Mosaic's ``tpu.dynamic_gather``
does not compile on this TPU stack at all.

Structure exploited instead: for volume z-slice z, voxel (p, q) projects
by a homography H_z = [b1, b2, c(z)] whose first two columns are fixed
across slices. Factoring through a reference slice plane (classic
plane-plus-parallax): with B = [b1, b2, c(z_r)],

    (u, w) = dehom(B · ((p + α_z)/γ_z, (q + β_z)/γ_z, 1)),
    (α_z, β_z, γ_z) = B^{-1} c(z),

i.e. in reference-plane coordinates every slice's lookup is a UNIFORM
per-slice scale + translation of the voxel grid. So:

  1. per frame: resample depth/assoc onto the reference-plane grid
     (one XLA gather at reference-grid scale — the only gather,
     amortized over all Z slices);
  2. per slice: two one-hot nearest-neighbor einsums (separable axis
     resampling) — dense 0/1-matrix matmuls that run on the MXU,
     exactly reproducing a gather from the reference grid;
  3. elementwise fusion math identical to ``ops/fusion.integrate_tsdf``;
     validity masks use the exact per-voxel projection, so only the
     depth/assoc VALUES go through the resample chain. Lookup error is
     bounded by the reference-grid cell size (sub-pixel at the default
     oversampling), vs the reference's own nearest-pixel rounding.

Plain jitted XLA (lax.scan over slices); no Pallas required.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


# Scan-axis selection: the pencil/sweep scan runs over the volume's
# leading (z) array axis; when the camera's optical axis is nearly
# perpendicular to volume z, slices project to grazing lines and the
# B-window degenerates. Relabeling the volume coords so the dominant
# optical axis becomes the scan axis fixes this: for scan axis s,
# new coord j = old coord AXIS_COORD[s][j], array transposed with
# AXIS_TRANSPOSE[s] (inverse AXIS_UNTRANSPOSE[s]).
AXIS_COORD = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}
AXIS_TRANSPOSE = {0: (2, 0, 1), 1: (1, 2, 0), 2: (0, 1, 2)}
AXIS_UNTRANSPOSE = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}


def pick_scan_axis(rel_rot_co) -> int:
    """Volume axis (0=x, 1=y, 2=z) most aligned with the camera optical
    axis; ``rel_rot_co`` maps camera coords to volume coords (host-side
    numpy — the choice is a static jit argument)."""
    import numpy as np
    return int(np.argmax(np.abs(np.asarray(rel_rot_co)[:3, 2])))


def _pencil_setup(rel_rot, rel_trans, intr, voxel_size, Z, Y, X):
    """Returns (Bmat, abg (Z,3), cam coeffs).

    Homogeneous pixel = H_z (p, q, 1)^T with
      H_z = [K r1 s, K r2 s, K (r3 s z~ + t0')],  z~ = z - (Z-1)/2,
      t0' = t - s (r1 ox + r2 oy).
    Reference slice = center (z~ = 0) -> B = [b1, b2, K t0'].
    cam coeffs: cam = ax*p + ay*q + c(z), rows (x, y, z).
    """
    s = voxel_size
    oz = (Z - 1) / 2.0
    oy = (Y - 1) / 2.0
    ox = (X - 1) / 2.0
    K = intr
    r1 = rel_rot[:, 0]
    r2 = rel_rot[:, 1]
    r3 = rel_rot[:, 2]
    b1 = K @ r1 * s
    b2 = K @ r2 * s
    t0 = rel_trans - s * (r1 * ox + r2 * oy)

    z = jnp.arange(Z, dtype=jnp.float32)
    zz = (z - oz) * s
    Bmat = jnp.stack([b1, b2, K @ t0], axis=1)
    Binv = jnp.linalg.inv(Bmat)
    cz = (K @ t0)[None, :] + zz[:, None] * (K @ r3)[None, :]   # (Z, 3)
    abg = cz @ Binv.T                                          # (Z, 3)

    # camera-space affine: cam = capx*p + capy*q + camc(z)
    capx = r1 * s                 # (3,)
    capy = r2 * s
    camc = t0[None, :] + zz[:, None] * r3[None, :]             # (Z, 3)
    return Bmat, Binv, abg, capx, capy, camc


def _window_from_quad(Binv, H, W, margin=2.0, abg=None, X=None, Y=None):
    """Reference-plane bounding box of the image quad B^{-1}([0,W]x[0,H]).

    Degenerate corners (near the plane at infinity) are clamped to a
    finite multiple of the image extent around the image-center warp.

    When ``abg`` (the per-slice (alpha, beta, gamma) rows) and the slice
    dims (X, Y) are given, the window is additionally intersected with
    the VOLUME's reference-plane extent — for small object volumes this
    shrinks the grid (and the per-slice matmuls) by the ratio of the
    object's footprint to the full image.
    """
    corners = jnp.asarray([[0.0, 0.0, 1.0], [W - 1.0, 0.0, 1.0],
                           [0.0, H - 1.0, 1.0], [W - 1.0, H - 1.0, 1.0]],
                          dtype=jnp.float32)
    q = corners @ Binv.T
    wcomp = q[:, 2]
    safe = jnp.where(jnp.abs(wcomp) < 1e-8,
                     jnp.where(wcomp < 0, -1e-8, 1e-8), wcomp)
    a = q[:, 0] / safe
    b = q[:, 1] / safe
    cc = jnp.asarray([(W - 1) / 2.0, (H - 1) / 2.0, 1.0]) @ Binv.T
    ccw = jnp.where(jnp.abs(cc[2]) < 1e-8, 1e-8, cc[2])
    ca, cb = cc[0] / ccw, cc[1] / ccw
    ext_a = jnp.clip(jnp.max(jnp.abs(a - ca)), 1.0, 4.0 * W)
    ext_b = jnp.clip(jnp.max(jnp.abs(b - cb)), 1.0, 4.0 * H)
    a_lo = ca - ext_a - margin
    b_lo = cb - ext_b - margin
    a_hi = ca + ext_a + margin
    b_hi = cb + ext_b + margin

    if abg is not None:
        # per-slice volume extent in B coords: a in [alpha, X-1+alpha]/gamma
        alpha, beta, gamma = abg[:, 0], abg[:, 1], abg[:, 2]
        ok = gamma > 1e-6
        ga = jnp.where(ok, gamma, 1.0)
        a1 = alpha / ga
        a2 = (X - 1.0 + alpha) / ga
        b1 = beta / ga
        b2 = (Y - 1.0 + beta) / ga
        big = jnp.float32(1e30)
        va_lo = jnp.min(jnp.where(ok, jnp.minimum(a1, a2), big)) - margin
        va_hi = jnp.max(jnp.where(ok, jnp.maximum(a1, a2), -big)) + margin
        vb_lo = jnp.min(jnp.where(ok, jnp.minimum(b1, b2), big)) - margin
        vb_hi = jnp.max(jnp.where(ok, jnp.maximum(b1, b2), -big)) + margin
        a_lo = jnp.maximum(a_lo, va_lo)
        a_hi = jnp.minimum(a_hi, va_hi)
        b_lo = jnp.maximum(b_lo, vb_lo)
        b_hi = jnp.minimum(b_hi, vb_hi)
        # guard empty intersections (volume fully behind/outside)
        a_hi = jnp.maximum(a_hi, a_lo + 1.0)
        b_hi = jnp.maximum(b_hi, b_lo + 1.0)

    return a_lo, b_lo, a_hi - a_lo, b_hi - b_lo


def _nearest_matrix(src_size: int, out_coords: jnp.ndarray) -> jnp.ndarray:
    """(src_size, len(out_coords)) 0/1 f32: column j selects
    src[round(out_coords[j])]; out-of-range columns select nothing."""
    idx = jnp.floor(out_coords + 0.5)
    rows = jax.lax.broadcasted_iota(
        jnp.float32, (src_size, out_coords.shape[0]), 0)
    return (rows == idx[None, :]).astype(jnp.float32)


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x to ~1e-6 relative.

    The optimization barrier is load-bearing: XLA's algebraic simplifier
    treats removing an f32->bf16->f32 convert round-trip as a legal
    precision-INCREASING rewrite, which silently turns ``x - f32(hi)``
    into ``x - x`` = 0 and collapses the split to a single bf16 chain
    (observed on XLA:TPU and XLA:CPU)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _matmul_gather(E_src, data, E_dst, bf16: bool):
    """depth_val[y, x] = sum_s sum_l E_src[s,y] data[s,l] E_dst[l,x].

    With ``bf16`` the 0/1 selection matrices are cast to bf16 (exact) and
    the f32 data is hi/lo-split, trading one f32 einsum chain for two
    bf16 chains — a large win on MXUs whose bf16 rate exceeds f32.
    """
    f32 = jnp.float32
    if not bf16:
        # Precision.DEFAULT = XLA's bf16-multipass f32 matmul (~2x the
        # HIGHEST rate on v5e, ~1e-6 relative accuracy) — explicitly
        # requested because the session default is HIGHEST for the
        # SE(3)/LM math. Contraction order L-then-S minimizes MACs
        # (S·L·X + S·X·Y < L·S·Y + Y·L·X when X <= L).
        prec = jax.lax.Precision.DEFAULT
        tmp = jnp.einsum("sl,lx->sx", data, E_dst,
                         preferred_element_type=f32, precision=prec)
        return jnp.einsum("sx,sy->yx", tmp, E_src,
                          preferred_element_type=f32, precision=prec)
    Es = E_src.astype(jnp.bfloat16)
    Ed = E_dst.astype(jnp.bfloat16)
    hi, lo = _split_bf16(data)
    out = None
    for part in (hi, lo):
        tmp = jnp.einsum("sl,sy->yl", part, Es,
                         preferred_element_type=f32)
        r = jnp.einsum("yl,lx->yx", tmp.astype(jnp.bfloat16), Ed,
                       preferred_element_type=f32)
        out = r if out is None else out + r
    return out


def _rup(v: int, m: int) -> int:
    return -(-v // m) * m


def select_pixels_mxu(img, pw, pu, valid, row_block: int = 8,
                      ladder=(16, 64), bf16: bool = True):
    """``where(valid, img[pw, pu], 0)`` without an XLA gather.

    XLA:TPU lowers an arbitrary gather to a ~0.11 G elem/s scalar loop
    (measured v5e) — ~5 ms for the 537k-element stage-1 pencil warp.
    This formulation selects the same values at MXU/VPU rate: for each
    block of ``row_block`` output rows, the needed image rows span
    [min(pw), max(pw)] (projective warps map output rows to near-linear
    image bands); a dynamic slice of the smallest fitting ladder rung of
    image rows feeds a one-hot row-select matmul, and columns are then
    selected with an elementwise one-hot multiply + lane reduction.

    Exactness: one-hot row/column selection of (hi, lo) bf16-split
    values reconstructs f32 exactly (selection never mixes values);
    ``bf16=False`` runs a single f32 chain instead.

    Args: ``pw``/``pu`` int32 indices already clipped to the image;
    ``valid`` the out-of-image mask applied to the result.
    """
    f32 = jnp.float32
    H, W = img.shape
    nS, nL = pw.shape
    SBK = row_block
    npad = (-nS) % SBK
    if npad:
        pw = jnp.pad(pw, ((0, npad), (0, 0)))
        pu = jnp.pad(pu, ((0, npad), (0, 0)))
    nB = pw.shape[0] // SBK
    pwf = pw.astype(f32).reshape(nB, SBK * nL)
    puf = pu.astype(f32).reshape(nB, SBK * nL)

    if bf16:
        band_hi_full, band_lo_full = _split_bf16(img)
    else:
        band_hi_full = img
        band_lo_full = None
    col_iota = jnp.arange(W, dtype=f32)[None, :]

    rungs = tuple(r for r in sorted(ladder) if r < H) + (H,)

    def block(_, xs):
        pwb, pub = xs                                  # (SBK*nL,)
        lo_r = jnp.min(pwb)
        hi_r = jnp.max(pwb)

        def wstart(WH):
            s = jnp.clip(lo_r, 0.0, float(H - WH))
            return jnp.floor(s / 8.0) * 8.0

        def mk(WH):
            def branch(_):
                ws = wstart(WH)
                ws_i = ws.astype(jnp.int32)
                row_iota = jnp.arange(WH, dtype=f32)[None, :]
                E1 = (row_iota == (pwb[:, None] - ws))  # (SBK*nL, WH)
                if bf16:
                    bh = lax.dynamic_slice(band_hi_full, (ws_i, 0),
                                           (WH, W))
                    bl = lax.dynamic_slice(band_lo_full, (ws_i, 0),
                                           (WH, W))
                    E1b = E1.astype(jnp.bfloat16)
                    P = (jnp.dot(E1b, bh, preferred_element_type=f32)
                         + jnp.dot(E1b, bl, preferred_element_type=f32))
                else:
                    b = lax.dynamic_slice(band_hi_full, (ws_i, 0),
                                          (WH, W))
                    P = jnp.dot(E1.astype(f32), b,
                                precision=jax.lax.Precision.DEFAULT)
                E2 = (col_iota == puf_b[:, None])       # (SBK*nL, W)
                return jnp.sum(P * E2, axis=1)
            return branch

        puf_b = pub

        idx = len(rungs) - 1
        sel = jnp.int32(idx)
        for i in range(len(rungs) - 2, -1, -1):
            WH = rungs[i]
            fits = hi_r < wstart(WH) + float(WH)
            sel = jnp.where(fits, jnp.int32(i), sel)
        val = lax.switch(sel, [mk(r) for r in rungs], None)
        return None, val

    _, vals = lax.scan(block, None, (pwf, puf))
    out = vals.reshape(nB * SBK, nL)[:nS]
    return jnp.where(valid, out, 0.0)


def warp_image_to_grid(img, Bmat, H: int, W: int, a0, b0, da, db,
                       nS: int, nL: int, mxu: bool | None = None,
                       bf16: bool = True):
    """Stage-1 pencil warp: resample ``img`` (H, W) onto the (nS, nL)
    reference-plane grid spanning [a0, a0+da) x [b0, b0+db) in B coords —
    the one amortized resample of the pencil factorization. Shared by
    the jnp scan path and the Pallas slice kernel.

    ``mxu`` selects the matmul-select formulation (default on TPU, where
    the plain gather runs on a scalar loop); the gather path elsewhere.
    """
    f32 = jnp.float32
    jj = (jnp.arange(nL, dtype=f32) + 0.5) / nL * da + a0
    ii = (jnp.arange(nS, dtype=f32) + 0.5) / nS * db + b0
    ag = jnp.broadcast_to(jj[None, :], (nS, nL))
    bg = jnp.broadcast_to(ii[:, None], (nS, nL))
    hom_u = Bmat[0, 0] * ag + Bmat[0, 1] * bg + Bmat[0, 2]
    hom_w = Bmat[1, 0] * ag + Bmat[1, 1] * bg + Bmat[1, 2]
    hom_z = Bmat[2, 0] * ag + Bmat[2, 1] * bg + Bmat[2, 2]
    zsafe = jnp.where(jnp.abs(hom_z) < 1e-12, 1e-12, hom_z)
    ug = hom_u / zsafe
    wg = hom_w / zsafe
    pu = jnp.clip(jnp.floor(ug + 0.5), 0, W - 1).astype(jnp.int32)
    pw = jnp.clip(jnp.floor(wg + 0.5), 0, H - 1).astype(jnp.int32)
    inb = (ug > -0.5) & (ug < W - 0.5) & (wg > -0.5) \
        & (wg < H - 0.5) & (hom_z > 0)
    if mxu is None:
        mxu = jax.default_backend() not in ("cpu",)
    if mxu:
        return select_pixels_mxu(img, pw, pu, inb, bf16=bf16)
    flat = pw * W + pu
    return jnp.where(inb, jnp.take(img.reshape(-1), flat), 0.0)


@functools.partial(jax.jit,
                   static_argnames=("SB", "LB", "bf16", "windowed"))
def _integrate_pencil(tsdf, weights, depth, assoc, rel_rot, rel_trans,
                      intr, voxel_size, truncdist, max_weight,
                      SB: int, LB: int, bf16: bool = False,
                      windowed: bool = False, carve_dist=None,
                      carve_weight_cap=None, carve_margin=None):
    Z, Y, X = tsdf.shape
    H, W = depth.shape
    f32 = jnp.float32
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]

    Bmat, Binv, abg, camc, D_B, A_B, scal = _pencil_stage1(
        depth, assoc, rel_rot, rel_trans, intr, voxel_size,
        (Z, Y, X), truncdist, max_weight, SB, LB,
        carve_dist=carve_dist, carve_weight_cap=carve_weight_cap,
        carve_margin=carve_margin)
    return _scan_slices(tsdf, weights, D_B, A_B, abg, camc, scal,
                        SB=SB, LB=LB, bf16=bf16, windowed=windowed,
                        H=H, W=W)


def _pencil_stage1(depth, assoc, rel_rot, rel_trans, intr, voxel_size,
                   shape, truncdist, max_weight, SB: int, LB: int,
                   carve_dist=None, carve_weight_cap=None,
                   carve_margin=None):
    """Global (z-independent) part of the pencil factorization: setup,
    image->B-grid warps, per-slice coefficient rows and the scalar
    bundle consumed by the slice scan. Shared by the single-device path
    and the z-sharded shard_map path (per-slice rows ``abg``/``camc``
    shard with the volume; everything else is replicated)."""
    Z, Y, X = shape
    H, W = depth.shape
    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        rel_rot, rel_trans, intr, voxel_size, Z, Y, X)
    a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=X, Y=Y)

    # ---- stage 1: warp depth/assoc to the reference-plane grid --------
    D_B = warp_image_to_grid(depth, Bmat, H, W, a0, b0, da, db, SB, LB)
    # association weights are piecewise smooth; a half-resolution grid
    # quarters their per-slice matmul cost
    SA = max(8, (SB // 2 + 7) // 8 * 8)
    LA = max(128, (LB // 2 + 127) // 128 * 128)
    A_B = warp_image_to_grid(assoc, Bmat, H, W, a0, b0, da, db, SA, LA)
    if carve_dist is None:
        carve_dist = truncdist
    if carve_weight_cap is None:
        carve_weight_cap = 1e30          # no clamp
    if carve_margin is None:
        carve_margin = -2.0              # cap every carve vote (r4)
    scal = jnp.stack([
        a0, b0, da, db, capx[0], capx[1], capx[2], capy[0], capy[1],
        capy[2], intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2],
        jnp.asarray(truncdist, jnp.float32),
        jnp.asarray(max_weight, jnp.float32),
        jnp.asarray(carve_dist, jnp.float32),
        jnp.asarray(carve_weight_cap, jnp.float32),
        jnp.asarray(carve_margin, jnp.float32)]).astype(jnp.float32)
    return Bmat, Binv, abg, camc, D_B, A_B, scal


@functools.partial(jax.jit,
                   static_argnames=("SB", "LB", "bf16", "windowed", "H",
                                    "W"))
def _scan_slices(tsdf, weights, D_B, A_B, abg, camc, scal,
                 SB: int, LB: int, bf16: bool, windowed: bool,
                 H: int, W: int):
    """Stage 2 of the pencil fusion: lax.scan over the (possibly
    shard-local) z slices with their per-slice coefficient rows."""
    Z, Y, X = tsdf.shape
    f32 = jnp.float32
    SA, LA = A_B.shape
    (a0, b0, da, db) = scal[0], scal[1], scal[2], scal[3]
    capx = scal[4:7]
    capy = scal[7:10]
    fx, fy, cx, cy = scal[10], scal[11], scal[12], scal[13]
    truncdist, max_weight = scal[14], scal[15]
    carve_dist, carve_cap = scal[16], scal[17]
    carve_margin = scal[18]

    pq_p = jnp.arange(X, dtype=f32)
    pq_q = jnp.arange(Y, dtype=f32)
    pv = jnp.broadcast_to(pq_p[None, :], (Y, X))
    qv = jnp.broadcast_to(pq_q[:, None], (Y, X))

    ra = SA / SB
    rl = LA / LB

    # Per-slice window ladder (windowed path): most slices' voxel
    # footprints cover only a fraction of the B grid — far slices shrink
    # as 1/gamma, behind-camera slices are empty. Dynamic-slicing a
    # quarter-/half-size window out of D_B/A_B before the one-hot matmul
    # gather cuts the per-slice MACs by the window ratio; a lax.switch
    # picks the smallest fitting ladder rung at runtime (TPU executes
    # only the taken branch — do NOT vmap this path, vmapped switch
    # degenerates to select-all-branches).
    LADDER = ((max(1, SB // 4), max(128, _rup(LB // 4, 128)),
               max(1, SA // 4), max(128, _rup(LA // 4, 128))),
              (max(1, _rup(SB // 2, 8)), max(128, _rup(LB // 2, 128)),
               max(1, _rup(SA // 2, 8)), max(128, _rup(LA // 2, 128))),
              (SB, LB, SA, LA))
    LADDER = tuple((min(sw, SB), min(lw, LB), min(saw, SA), min(law, LA))
                   for sw, lw, saw, law in LADDER)

    def _gather_vals(ja, ib, ja_a, ib_a):
        """depth/assoc at the slice's B coords, full-grid one-hot matmul."""
        Ecol = _nearest_matrix(LB, ja)                          # (LB, X)
        Erow = _nearest_matrix(SB, ib)                          # (SB, Y)
        depth_val = _matmul_gather(Erow, D_B, Ecol, bf16)
        Ecol_a = _nearest_matrix(LA, ja_a)
        Erow_a = _nearest_matrix(SA, ib_a)
        assoc_val = _matmul_gather(Erow_a, A_B, Ecol_a, bf16)
        return depth_val, assoc_val

    def _gather_vals_windowed(ja, ib, ja_a, ib_a):
        """Same values via the smallest fitting window of the B grids.

        Exactness: nearest-matrix selection index floor(c+0.5) is valid
        iff in [0, n); a window [lo, lo+Wn) with integer lo covering the
        clipped index range reproduces the full-grid selection (indices
        outside the grid select nothing in both paths).
        """
        def rng(c, n):
            lo = jnp.clip(jnp.floor(jnp.min(c) + 0.5), 0.0, n)
            hi = jnp.clip(jnp.floor(jnp.max(c) + 0.5) + 1.0, 0.0, n)
            return lo.astype(jnp.int32), (hi - lo).astype(jnp.int32)

        l_lo, need_l = rng(ja, LB)
        s_lo, need_s = rng(ib, SB)
        la_lo, need_la = rng(ja_a, LA)
        sa_lo, need_sa = rng(ib_a, SA)
        empty = (need_l <= 0) | (need_s <= 0)

        def fits(rung):
            sw, lw, saw, law = rung
            return ((need_s <= sw) & (need_l <= lw)
                    & (need_sa <= saw) & (need_la <= law))

        idx = jnp.where(
            empty, 0, jnp.where(fits(LADDER[0]), 1,
                                jnp.where(fits(LADDER[1]), 2, 3)))

        def skip(_):
            zero = jnp.zeros((Y, X), f32)
            return zero, zero

        def mk(rung):
            sw, lw, saw, law = rung
            if (sw, lw, saw, law) == (SB, LB, SA, LA):
                return lambda _: _gather_vals(ja, ib, ja_a, ib_a)

            def branch(_):
                ws = jnp.minimum(s_lo, SB - sw)
                wl = jnp.minimum(l_lo, LB - lw)
                wsa = jnp.minimum(sa_lo, SA - saw)
                wla = jnp.minimum(la_lo, LA - law)
                Dw = jax.lax.dynamic_slice(D_B, (ws, wl), (sw, lw))
                Aw = jax.lax.dynamic_slice(A_B, (wsa, wla), (saw, law))
                dv = _matmul_gather(
                    _nearest_matrix(sw, ib - ws.astype(f32)), Dw,
                    _nearest_matrix(lw, ja - wl.astype(f32)), bf16)
                av = _matmul_gather(
                    _nearest_matrix(saw, ib_a - wsa.astype(f32)), Aw,
                    _nearest_matrix(law, ja_a - wla.astype(f32)), bf16)
                return dv, av
            return branch

        return jax.lax.switch(idx, [skip] + [mk(r) for r in LADDER], None)

    def body(carry, xs):
        tslice, wslice, coef, cc = xs
        alpha, beta, gamma = coef[0], coef[1], coef[2]
        gsafe = jnp.where(jnp.abs(gamma) < 1e-12, 1e-12, gamma)

        # B-plane coords of this slice's voxels -> B-grid index coords
        ja = ((pq_p + alpha) / gsafe - a0) / da * LB - 0.5      # (X,)
        ib = ((pq_q + beta) / gsafe - b0) / db * SB - 0.5       # (Y,)
        # behind-reference-plane slices (gamma <= 0) flip orientation;
        # masks below (cam_z) make those voxels no-ops; indices are junk
        ja_a = (ja + 0.5) * rl - 0.5
        ib_a = (ib + 0.5) * ra - 0.5
        gather_fn = _gather_vals_windowed if windowed else _gather_vals
        depth_val, assoc_val = gather_fn(ja, ib, ja_a, ib_a)

        # exact per-voxel projection for masks / sdf
        camx = capx[0] * pv + capy[0] * qv + cc[0]
        camy = capx[1] * pv + capy[1] * qv + cc[1]
        camz = capx[2] * pv + capy[2] * qv + cc[2]
        in_front = camz > 0.0
        zs = jnp.where(in_front, camz, 1.0)
        u = camx * fx / zs + cx
        w = camy * fy / zs + cy
        pix_x = jnp.floor(u + 0.5).astype(jnp.int32)
        pix_y = jnp.floor(w + 0.5).astype(jnp.int32)
        in_frame = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)

        valid = in_front & in_frame & (depth_val > 0.0)

        # mirrors the Pallas epilogue's (pix - c) * inv_f form (sub-ulp
        # vs the divide; keeps the two backends tightly matched)
        ux = (pix_x.astype(f32) - cx) * (1.0 / fx)
        uy = (pix_y.astype(f32) - cy) * (1.0 / fy)
        # single-sqrt form of norm_cam / lam (bit-matches the Pallas
        # kernel; ~1 ulp vs the reference's two-sqrt form)
        sdf = depth_val - jnp.sqrt(
            (camx * camx + camy * camy + camz * camz)
            / (ux * ux + uy * uy + 1.0))

        in_band = valid & (sdf >= -truncdist)
        tsdf_meas = jnp.clip(sdf / truncdist, -1.0, 1.0)
        # carve_dist = truncdist / carve_cap = inf reproduce the
        # reference exactly; see ops.fusion.integrate_tsdf's docstring
        # for the free-space carving semantics
        carving = valid & (sdf >= carve_dist)
        new_w = jnp.where(carving, 1.0, assoc_val)
        capped = carving & (tsdf_meas - tslice > carve_margin)
        w_eff = jnp.where(capped, jnp.minimum(wslice, carve_cap),
                          wslice)

        denom = w_eff + new_w
        do_update = in_band & (denom > 0.0)
        fused = (w_eff * tslice + new_w * tsdf_meas) / jnp.where(
            do_update, denom, 1.0)
        t_out = jnp.where(do_update, fused, tslice)
        w_out = jnp.where(do_update, jnp.minimum(denom, max_weight),
                          wslice)

        carve = valid & (sdf < -truncdist) & (wslice == 0.0)
        t_out = jnp.where(carve, -1.0, t_out)

        reset = (wslice == 0.0) & in_frame & in_front & (depth_val <= 0.0)
        reset |= (wslice == 0.0) & ~in_front
        t_out = jnp.where(reset, 0.0, t_out)
        return carry, (t_out, w_out)

    _, (t_new, w_new) = jax.lax.scan(body, None,
                                     (tsdf, weights, abg, camc))
    return t_new, w_new


def integrate_tsdf_pencil(tsdf, weights, depth, assoc_weights, rel_rot_oc,
                          rel_trans_oc, intr, voxel_size, truncdist,
                          max_weight, oversample: float = 1.25,
                          bf16: bool = False, grid=None, axis: int = 2,
                          windowed: bool = False, carve_dist=None,
                          carve_weight_cap=None, carve_margin=None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`ops.fusion.integrate_tsdf`.

    ``grid``: optional static (SB, LB) reference-grid size. The window is
    clipped to the volume's projected extent, so a small volume (object)
    can use a much smaller grid than the image without losing sampling
    density — cutting the per-slice matmuls proportionally.

    ``axis``: static scan axis (see :func:`pick_scan_axis`); the volume is
    relabeled so this axis is the slice-scan axis, fixing the grazing-
    slice degeneracy at extreme camera pitch.

    ``windowed``: per-slice B-window ladder (skip/quarter/half/full via
    lax.switch) — numerically identical to the full path, and cuts the
    matmul-gather MACs by the slice footprint ratio. Default OFF:
    measured on v5e, per-slice XLA conditionals cost ~14 us each (512
    slices -> +7 ms), more than the MAC savings buy back (26.8 ms vs
    19.4 ms full / 13.5 ms half-grid). Kept as a documented experiment;
    a Pallas slice kernel with in-VMEM windows is the path that pays.
    MUST stay False when the call is vmapped (e.g. over an object
    pool): vmap lowers switch to select, executing every rung.
    """
    tsdf = jnp.asarray(tsdf, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    rel_rot_oc = jnp.asarray(rel_rot_oc)
    depth = jnp.asarray(depth, jnp.float32)
    H, W = depth.shape
    if grid is not None:
        SB, LB = grid
    else:
        SB = int(-(-int(H * oversample) // 8) * 8)
        LB = int(-(-int(W * oversample) // 128) * 128)
    if axis != 2:
        # p_cam = R p_vol + t = (R P^T) p'_vol + t: permute R's columns
        tsdf = jnp.transpose(tsdf, AXIS_TRANSPOSE[axis])
        weights = jnp.transpose(weights, AXIS_TRANSPOSE[axis])
        rel_rot_oc = rel_rot_oc[:, jnp.asarray(AXIS_COORD[axis], jnp.int32)]
    t_new, w_new = _integrate_pencil(
        tsdf, weights, depth,
        jnp.asarray(assoc_weights, jnp.float32),
        rel_rot_oc, jnp.asarray(rel_trans_oc),
        jnp.asarray(intr), jnp.float32(voxel_size),
        jnp.float32(truncdist), jnp.float32(max_weight), SB=SB, LB=LB,
        bf16=bf16, windowed=windowed,
        carve_dist=(None if carve_dist is None
                    else jnp.float32(carve_dist)),
        carve_weight_cap=(None if carve_weight_cap is None
                          else jnp.float32(carve_weight_cap)),
        carve_margin=(None if carve_margin is None
                      else jnp.float32(carve_margin)))
    if axis != 2:
        t_new = jnp.transpose(t_new, AXIS_UNTRANSPOSE[axis])
        w_new = jnp.transpose(w_new, AXIS_UNTRANSPOSE[axis])
    return t_new, w_new
