"""Pallas TPU kernel for pencil-warp TSDF fusion.

Production TPU path for ``kernel_updateTSDF``
(``src/core/cuda/TSDF.cu:327-427``), replacing the jnp ``lax.scan``
pencil path (``ops/fusion_pencil.py``) whose per-slice one-hot matmul
gathers run from HBM through XLA at f32 rates — measured 19 ms at 512^3
on v5e, 13.8% of the HBM roofline (BENCH_r01).

What moves into the kernel (per z-slice program):
  * the warped reference-plane depth/assoc grids stay **resident in
    VMEM** across all Z grid steps (constant index map) — no per-slice
    HBM re-reads;
  * the one-hot selection matrices are generated **on the fly in VMEM**
    (iota-vs-index compares, never touching HBM) in bf16 — exact, since
    0/1 and integer indices < 2^8 are bf16-representable;
  * the depth grid is pre-split into a hi/lo bf16 pair (hi + lo
    reconstructs f32 to ~1e-7 relative): two bf16 MXU chains replace
    one f32 chain at ~4x the f32-HIGHEST MAC rate; the intermediate
    ``(SB, X)`` product is a pure selection, so its bf16 recast is
    exact and the second chain is also full-rate bf16;
  * association values are piecewise smooth in [0, 1]: a single bf16
    chain on the half-resolution grid suffices;
  * the fusion elementwise math (projective sdf, truncation, weighted
    running average, carve/reset rules — identical to
    ``ops/fusion.integrate_tsdf``) runs on the VPU over the same VMEM
    block and the tsdf/weight slice read+write streams from HBM overlap
    the MXU work via the Pallas grid pipeline.

The per-slice lookup coordinates are affine in the voxel index
(``ja = ka*p + ca``) — the pencil factorization — so each program needs
only 8 scalars (SMEM) besides the resident grids.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emfusion_tpu.ops.fusion_pencil import (
    AXIS_COORD, AXIS_TRANSPOSE, AXIS_UNTRANSPOSE,
    _pencil_setup, _split_bf16, _window_from_quad, warp_image_to_grid,
)

_BF = jnp.bfloat16


def _kernel(coef_ref, glob_ref, dhi_ref, dlo_ref, abf_ref,
            t_ref, w_ref, to_ref, wo_ref, *scratch,
            Wimg: int, Himg: int, XB: int, ladder=()):
    # scratch = (dval_scr, aval_scr) on the windowed path only (the
    # pl.when rungs need a common landing buffer); the unwindowed path
    # keeps dval/aval in registers — scratch would push VMEM past the
    # point where the grid pipeline can double-buffer the volume blocks
    dval_scr, aval_scr = scratch if scratch else (None, None)
    f32 = jnp.float32
    z = pl.program_id(0)
    ka, ca = coef_ref[z, 0], coef_ref[z, 1]
    kb, cb = coef_ref[z, 2], coef_ref[z, 3]
    cc0, cc1, cc2 = coef_ref[z, 4], coef_ref[z, 5], coef_ref[z, 6]
    capx0, capx1, capx2 = glob_ref[0, 0], glob_ref[0, 1], glob_ref[0, 2]
    capy0, capy1, capy2 = glob_ref[0, 3], glob_ref[0, 4], glob_ref[0, 5]
    fx, fy = glob_ref[0, 6], glob_ref[0, 7]
    cx, cy = glob_ref[0, 8], glob_ref[0, 9]
    trunc, max_w = glob_ref[0, 10], glob_ref[0, 11]
    rl, ra = glob_ref[0, 12], glob_ref[0, 13]
    carve = glob_ref[0, 14]      # = trunc for exact reference semantics
    carve_cap = glob_ref[0, 15]  # = inf for exact reference semantics

    Y = t_ref.shape[1]
    SB, LB = dhi_ref.shape
    SA, LA = abf_ref.shape
    x0 = (pl.program_id(1) * XB).astype(f32)

    # Mosaic's tpu.iota is integer-only; cast after generating
    px = lax.broadcasted_iota(jnp.int32, (1, XB), 1).astype(f32) + x0
    qy = lax.broadcasted_iota(jnp.int32, (Y, 1), 0).astype(f32)

    ja = ka * px + ca                                     # (1, XB)
    ib = kb * qy + cb                                     # (Y, 1)
    jaa = (ja + 0.5) * rl - 0.5
    iba = (ib + 0.5) * ra - 0.5

    def onehot_cols(n, c, off=None):
        # (n, XB) bf16; column j selects row floor(c[j]+0.5)-off, nothing
        # if out of range (reproduces fusion_pencil._nearest_matrix)
        idx = jnp.floor(c + 0.5)
        if off is not None:
            idx = idx - off
        rows = lax.broadcasted_iota(jnp.int32, (n, c.shape[1]), 0
                                    ).astype(f32)
        return (rows == idx).astype(_BF)

    def onehot_rows_t(n, c, off=None):
        # (Y, n) bf16; row y selects source row floor(c[y]+0.5)-off
        idx = jnp.floor(c + 0.5)
        if off is not None:
            idx = idx - off
        cols = lax.broadcasted_iota(jnp.int32, (c.shape[0], n), 1
                                    ).astype(f32)
        return (cols == idx).astype(_BF)

    def gather_full():
        Ec = onehot_cols(LB, ja)
        Ert = onehot_rows_t(SB, ib)
        tmp_hi = jnp.dot(dhi_ref[:], Ec, preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
        tmp_lo = jnp.dot(dlo_ref[:], Ec, preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
        # tmp_* entries are single selected bf16 values -> recast exact
        dval = (jnp.dot(Ert, tmp_hi.astype(_BF),
                        preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
                + jnp.dot(Ert, tmp_lo.astype(_BF),
                          preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT))
        Eca = onehot_cols(LA, jaa)
        Erta = onehot_rows_t(SA, iba)
        tmpa = jnp.dot(abf_ref[:], Eca, preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
        aval = jnp.dot(Erta, tmpa.astype(_BF),
                       preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
        if dval_scr is None:
            return dval, aval
        dval_scr[:] = dval
        aval_scr[:] = aval
        return None

    if not ladder:
        dval, aval = gather_full()
    else:
        # ---- per-program window ladder ------------------------------
        # The one-hot selection only reads the B-grid rows/cols that the
        # nearest indices of THIS (z, x-block) program touch. Dynamic-
        # slicing the smallest fitting window out of the VMEM-resident
        # grids before the matmul chains cuts the MAC count by the
        # window ratio (far slices shrink as 1/gamma). Exactness: a
        # window [s, s+Wn) with s <= max(lo,0) and min(hi, n-1) < s+Wn
        # reproduces the full-grid selection — in-range indices land in
        # the window, out-of-range indices select nothing in both paths
        # (window rows are real grid rows, so an index outside [0,n)
        # maps outside [0,Wn) after the shift).
        x1 = x0 + float(XB - 1)
        ja0, ja1 = ka * x0 + ca, ka * x1 + ca
        ib0, ib1 = cb, kb * float(Y - 1) + cb
        jaa0, jaa1 = (ja0 + 0.5) * rl - 0.5, (ja1 + 0.5) * rl - 0.5
        iba0, iba1 = (ib0 + 0.5) * ra - 0.5, (ib1 + 0.5) * ra - 0.5

        def rng(c0, c1):
            lo = jnp.floor(jnp.minimum(c0, c1) + 0.5)
            hi = jnp.floor(jnp.maximum(c0, c1) + 0.5)
            return lo, hi

        jlo, jhi = rng(ja0, ja1)
        ilo, ihi = rng(ib0, ib1)
        jalo, jahi = rng(jaa0, jaa1)
        ialo, iahi = rng(iba0, iba1)

        empty = ((jhi < 0.0) | (jlo > float(LB - 1))
                 | (ihi < 0.0) | (ilo > float(SB - 1)))

        def wstart(lo, n, wn, align):
            s = jnp.clip(lo, 0.0, float(n - wn))
            return jnp.floor(s / align) * align

        def fits1(lo, hi, n, wn, align):
            return jnp.minimum(hi, float(n - 1)) < \
                wstart(lo, n, wn, align) + float(wn)

        def fits(rung):
            sw, lw, saw, law = rung
            return (fits1(jlo, jhi, LB, lw, 128.0)
                    & fits1(ilo, ihi, SB, sw, 8.0)
                    & fits1(jalo, jahi, LA, law, 128.0)
                    & fits1(ialo, iahi, SA, saw, 8.0))

        def gather_win(rung):
            sw, lw, saw, law = rung
            wl = wstart(jlo, LB, lw, 128.0)
            ws = wstart(ilo, SB, sw, 8.0)
            wla = wstart(jalo, LA, law, 128.0)
            wsa = wstart(ialo, SA, saw, 8.0)
            wl_i = pl.multiple_of(wl.astype(jnp.int32), 128)
            ws_i = pl.multiple_of(ws.astype(jnp.int32), 8)
            wla_i = pl.multiple_of(wla.astype(jnp.int32), 128)
            wsa_i = pl.multiple_of(wsa.astype(jnp.int32), 8)
            Ec = onehot_cols(lw, ja, wl)
            Ert = onehot_rows_t(sw, ib, ws)
            dh = dhi_ref[pl.ds(ws_i, sw), pl.ds(wl_i, lw)]
            dl = dlo_ref[pl.ds(ws_i, sw), pl.ds(wl_i, lw)]
            tmp_hi = jnp.dot(dh, Ec, preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
            tmp_lo = jnp.dot(dl, Ec, preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
            dval = (jnp.dot(Ert, tmp_hi.astype(_BF),
                            preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
                    + jnp.dot(Ert, tmp_lo.astype(_BF),
                              preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT))
            ab = abf_ref[pl.ds(wsa_i, saw), pl.ds(wla_i, law)]
            tmpa = jnp.dot(ab, onehot_cols(law, jaa, wla),
                           preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
            aval = jnp.dot(onehot_rows_t(saw, iba, wsa),
                           tmpa.astype(_BF), preferred_element_type=f32,
                   precision=lax.Precision.DEFAULT)
            dval_scr[:] = dval
            aval_scr[:] = aval

        conds = []
        prev_miss = ~empty
        for rung in ladder:
            f = fits(rung)
            conds.append(prev_miss & f)
            prev_miss = prev_miss & ~f
        # mutually exclusive: empty / each rung / full fallback

        @pl.when(empty)
        def _():
            dval_scr[:] = jnp.zeros_like(dval_scr)
            aval_scr[:] = jnp.zeros_like(aval_scr)

        for cond, rung in zip(conds, ladder):
            @pl.when(cond)
            def _(rung=rung):
                gather_win(rung)

        @pl.when(prev_miss)
        def _():
            gather_full()

        dval = dval_scr[:]
        aval = aval_scr[:]

    # ---- fusion elementwise math (matches ops/fusion.integrate_tsdf) --
    camx = capx0 * px + (capy0 * qy + cc0)
    camy = capx1 * px + (capy1 * qy + cc1)
    camz = capx2 * px + (capy2 * qy + cc2)
    in_front = camz > 0.0
    zs = jnp.where(in_front, camz, 1.0)
    u = camx * fx / zs + cx
    w = camy * fy / zs + cy
    pix_x = jnp.floor(u + 0.5)
    pix_y = jnp.floor(w + 0.5)
    in_frame = ((pix_x >= 0) & (pix_x < Wimg)
                & (pix_y >= 0) & (pix_y < Himg))

    valid = in_front & in_frame & (dval > 0.0)

    ux = (pix_x - cx) / fx
    uy = (pix_y - cy) / fy
    # norm_cam / lam as a single sqrt of the ratio (one transcendental
    # per voxel instead of two; same value to ~1 ulp)
    sdf = dval - jnp.sqrt((camx * camx + camy * camy + camz * camz)
                          / (ux * ux + uy * uy + 1.0))

    in_band = valid & (sdf >= -trunc)
    tsdf_meas = jnp.clip(sdf / trunc, -1.0, 1.0)
    carving = valid & (sdf >= carve)
    new_w = jnp.where(carving, 1.0, aval)

    # volumes may be stored compressed (bf16) in HBM; all math is f32
    tsl = t_ref[0].astype(f32)
    wsl = w_ref[0].astype(f32)
    w_eff = jnp.where(carving, jnp.minimum(wsl, carve_cap), wsl)
    denom = w_eff + new_w
    do_update = in_band & (denom > 0.0)
    fused = (w_eff * tsl + new_w * tsdf_meas) / jnp.where(do_update, denom,
                                                          1.0)
    t_out = jnp.where(do_update, fused, tsl)
    w_out = jnp.where(do_update, jnp.minimum(denom, max_w), wsl)

    carve_unseen = valid & (sdf < -trunc) & (wsl == 0.0)
    t_out = jnp.where(carve_unseen, -1.0, t_out)

    reset = (wsl == 0.0) & in_frame & in_front & (dval <= 0.0)
    reset |= (wsl == 0.0) & ~in_front
    t_out = jnp.where(reset, 0.0, t_out)

    to_ref[0] = t_out.astype(to_ref.dtype)
    wo_ref[0] = w_out.astype(wo_ref.dtype)


def _make_ladder(SB, LB, SA, LA):
    """Quarter/half window rungs (full grid is the fallback). Sizes are
    lane/sublane aligned; rungs that don't shrink the grid are dropped."""
    def rup(v, m):
        return -(-v // m) * m

    rungs = []
    for den in (4, 2):
        rung = (min(rup(max(SB // den, 8), 8), SB),
                min(rup(max(LB // den, 128), 128), LB),
                min(rup(max(SA // den, 8), 8), SA),
                min(rup(max(LA // den, 128), 128), LA))
        if rung != (SB, LB, SA, LA) and rung not in rungs:
            rungs.append(rung)
    return tuple(rungs)


@functools.partial(jax.jit, static_argnames=("SB", "LB", "XB",
                                             "windowed", "interpret"))
def _integrate_pencil_pallas(tsdf, weights, depth, assoc, rel_rot,
                             rel_trans, intr, voxel_size, truncdist,
                             max_weight, carve_dist, carve_weight_cap,
                             SB: int, LB: int, XB: int,
                             windowed: bool = False,
                             interpret: bool = False):
    Z, Y, X = tsdf.shape
    H, W = depth.shape
    f32 = jnp.float32

    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        rel_rot, rel_trans, intr, voxel_size, Z, Y, X)
    a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=X, Y=Y)

    SA = max(8, (SB // 2 + 7) // 8 * 8)
    LA = max(128, (LB // 2 + 127) // 128 * 128)
    if interpret or jax.default_backend() in ("cpu",):
        warp = warp_image_to_grid
    else:
        # stage 1 on the Pallas warp kernel (the XLA gather is a
        # ~0.11 G elem/s scalar loop; the one-hot XLA fallback spills an
        # (outputs x W) intermediate to HBM)
        from emfusion_tpu.ops.pallas.warp_pallas import (
            warp_image_to_grid_pallas)
        warp = warp_image_to_grid_pallas
    D_B = warp(depth, Bmat, H, W, a0, b0, da, db, SB, LB)
    A_B = warp(assoc, Bmat, H, W, a0, b0, da, db, SA, LA)

    D_hi, D_lo = _split_bf16(D_B)
    A_bf = A_B.astype(_BF)

    gamma = abg[:, 2]
    gsafe = jnp.where(jnp.abs(gamma) < 1e-12, 1e-12, gamma)
    ka = LB / (gsafe * da)
    ca = (abg[:, 0] / gsafe - a0) / da * LB - 0.5
    kb = SB / (gsafe * db)
    cb = (abg[:, 1] / gsafe - b0) / db * SB - 0.5
    coef = jnp.stack([ka, ca, kb, cb, camc[:, 0], camc[:, 1], camc[:, 2],
                      jnp.zeros_like(ka)], axis=1).astype(f32)   # (Z, 8)
    glob = jnp.concatenate([
        capx.astype(f32), capy.astype(f32),
        jnp.stack([intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2],
                   jnp.asarray(truncdist, f32),
                   jnp.asarray(max_weight, f32),
                   jnp.asarray(LA / LB, f32),
                   jnp.asarray(SA / SB, f32),
                   jnp.asarray(carve_dist, f32),
                   jnp.asarray(carve_weight_cap, f32)]),
    ])[None, :]                                                  # (1, 16)

    NX = X // XB
    grid = (Z, NX)
    ladder = _make_ladder(SB, LB, SA, LA) if windowed else ()
    kern = functools.partial(_kernel, Wimg=W, Himg=H, XB=XB,
                             ladder=ladder)

    vol_spec = pl.BlockSpec((1, Y, XB), lambda z, j: (z, 0, j),
                            memory_space=pltpu.VMEM)
    flops = 2 * Z * (2 * (SB * LB * XB + SB * XB * Y)
                     + (SA * LA * XB + SA * XB * Y)) * NX
    t_new, w_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Z, 8), lambda z, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda z, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SB, LB), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, LB), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SA, LA), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vol_spec,
            vol_spec,
        ],
        out_specs=(vol_spec, vol_spec),
        out_shape=(jax.ShapeDtypeStruct((Z, Y, X), tsdf.dtype),
                   jax.ShapeDtypeStruct((Z, Y, X), weights.dtype)),
        scratch_shapes=([pltpu.VMEM((Y, XB), f32),
                         pltpu.VMEM((Y, XB), f32)] if ladder else []),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Z * Y * X * (tsdf.dtype.itemsize
                                            + weights.dtype.itemsize),
            transcendentals=2 * Z * Y * X),
        interpret=interpret,
    )(coef, glob, D_hi, D_lo, A_bf, tsdf, weights)
    return t_new, w_new


def integrate_tsdf_pencil_pallas(tsdf, weights, depth, assoc_weights,
                                 rel_rot_oc, rel_trans_oc, intr,
                                 voxel_size, truncdist, max_weight,
                                 oversample: float = 1.25, grid=None,
                                 axis: int = 2, x_block: int = 0,
                                 windowed: bool = False,
                                 interpret: bool = False,
                                 carve_dist=None,
                                 carve_weight_cap=None
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for
    :func:`emfusion_tpu.ops.fusion_pencil.integrate_tsdf_pencil` backed
    by the Pallas slice kernel. Same semantics (nearest-grid depth /
    assoc values through the pencil warp; exact per-voxel masks), bf16
    hi/lo matmul chains (~1e-7 relative depth error).

    ``x_block``: voxel-x tile per program (0 = whole row). Smaller tiles
    cut VMEM at unchanged MAC count (the (SB,LB)x(LB,XB) and
    (Y,SB)x(SB,XB) products tile exactly).
    """
    # volumes keep their storage dtype (f32 or compressed bf16); the
    # kernel reads/writes that dtype and computes in f32 in VMEM
    tsdf = jnp.asarray(tsdf)
    weights = jnp.asarray(weights)
    rel_rot_oc = jnp.asarray(rel_rot_oc)
    depth = jnp.asarray(depth, jnp.float32)
    H, W = depth.shape
    if grid is not None:
        SB, LB = grid
    else:
        SB = int(-(-int(H * oversample) // 8) * 8)
        LB = int(-(-int(W * oversample) // 128) * 128)
    if axis != 2:
        tsdf = jnp.transpose(tsdf, AXIS_TRANSPOSE[axis])
        weights = jnp.transpose(weights, AXIS_TRANSPOSE[axis])
        rel_rot_oc = rel_rot_oc[:, jnp.asarray(AXIS_COORD[axis], jnp.int32)]
    X = tsdf.shape[2]
    XB = x_block if x_block and X % x_block == 0 else X
    t_new, w_new = _integrate_pencil_pallas(
        tsdf, weights, depth, jnp.asarray(assoc_weights, jnp.float32),
        rel_rot_oc, jnp.asarray(rel_trans_oc), jnp.asarray(intr),
        jnp.float32(voxel_size), jnp.float32(truncdist),
        jnp.float32(max_weight),
        jnp.float32(truncdist if carve_dist is None else carve_dist),
        jnp.float32(1e30 if carve_weight_cap is None
                    else carve_weight_cap),
        SB=SB, LB=LB, XB=XB, windowed=windowed, interpret=interpret)
    if axis != 2:
        t_new = jnp.transpose(t_new, AXIS_UNTRANSPOSE[axis])
        w_new = jnp.transpose(w_new, AXIS_UNTRANSPOSE[axis])
    return t_new, w_new
