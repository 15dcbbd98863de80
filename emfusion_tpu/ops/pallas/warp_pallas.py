"""Pallas TPU kernel for projective image->grid warps.

Replaces the stage-1 pencil warp gather (``kernel_updateTSDF``'s
per-voxel depth lookup factored to a per-frame resample,
``src/core/cuda/TSDF.cu:344-356``) and the sweep raycast's pixel->B-grid
warp-back. XLA:TPU lowers the straightforward 537k-element gather to a
~0.11 G elem/s scalar loop (~5-6 ms/frame measured on v5e); the XLA
one-hot matmul formulation materializes an (outputs x W) intermediate in
HBM per row block, which costs nearly as much.

r5 formulation (the r2-r4 kernel did one (TH,TW)x(TW,LBK) matmul per
output sub-row — M=TH wasted MXU rows and 16 small dispatches per
program; measured ~9% of peak, 3.1 ms/frame at the bench point):

  * each program produces an (SBK, LBK) output tile handled as NOUT =
    SBK*LBK **flattened** outputs; coordinates are generated directly in
    the flat (NOUT, 1) layout (no relayouts) from the homography
    scalars;
  * the tile's source pixels span a bounded image window (a projective
    map sends a small output rectangle to a small quad); a dynamic 2-D
    window slice of the smallest fitting ladder rung (TH, TW) feeds
  * ONE row-selection matmul per bf16 half: (NOUT, TH) one-hot @
    (TH, TW) window — M=NOUT fills the MXU; then the column selection
    is an elementwise one-hot multiply + lane reduction on the f32
    (hi+lo) sum. Selection of hi/lo bf16-split values reconstructs f32
    exactly (selection never mixes values).

Window ladder misses (extreme poses) fall back to the full image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF = jnp.bfloat16


def _warp_kernel(m_ref, hi_ref, lo_ref, out_ref, *, nS: int, nL: int,
                 SBK: int, LBK: int, rungs, round_half: bool,
                 mask_oob: bool, H: int, W: int, grid_coords: bool = True):
    """``H``/``W`` are the TRUE (unpadded) source dims — clip and
    in-bounds tests must use them, not ``hi_ref.shape`` (the 8/128-padded
    VMEM dims), or clip-only lookups past the true edge would return
    padding zeros instead of the clamped edge value."""
    f32 = jnp.float32
    Hp, Wp = hi_ref.shape
    m00, m01, m02 = m_ref[0, 0], m_ref[0, 1], m_ref[0, 2]
    m10, m11, m12 = m_ref[0, 3], m_ref[0, 4], m_ref[0, 5]
    m20, m21, m22 = m_ref[0, 6], m_ref[0, 7], m_ref[0, 8]
    a0, b0, da, db = (m_ref[0, 9], m_ref[0, 10], m_ref[0, 11],
                      m_ref[0, 12])

    NOUT = SBK * LBK
    l0 = pl.program_id(1) * LBK
    s0 = pl.program_id(0) * SBK
    # flat output index f = s_local * LBK + l_local, generated natively
    # in the (NOUT, 1) layout: no relayout between coords and one-hots
    fidx = lax.broadcasted_iota(jnp.int32, (1, NOUT), 1)
    s_loc = lax.div(fidx, jnp.int32(LBK))
    l_loc = lax.rem(fidx, jnp.int32(LBK))
    sv = (s_loc + s0).astype(f32)
    lv = (l_loc + l0).astype(f32)
    if grid_coords:
        # bit-identical coords to fusion_pencil.warp_image_to_grid: same
        # f32 op order ((l+0.5)/nL*da + a0, then 2-term homography sums)
        ag = (lv + 0.5) / float(nL) * da + a0
        bg = (sv + 0.5) / float(nS) * db + b0
    else:
        ag = lv
        bg = sv
    hu = m00 * ag + m01 * bg + m02
    hw = m10 * ag + m11 * bg + m12
    hz = m20 * ag + m21 * bg + m22
    zs = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
    ug = hu / zs
    wg = hw / zs
    off = 0.5 if round_half else 0.0
    pu = jnp.clip(jnp.floor(ug + off), 0.0, W - 1.0)       # (1, NOUT)
    pw = jnp.clip(jnp.floor(wg + off), 0.0, H - 1.0)
    if mask_oob:
        inb = ((ug > -0.5) & (ug < W - 0.5) & (wg > -0.5)
               & (wg < H - 0.5) & (hz > 0.0))
    else:
        inb = None

    rmin = jnp.min(pw)
    rmax = jnp.max(pw)
    cmin = jnp.min(pu)
    cmax = jnp.max(pu)

    def rstart(TH):
        v = jnp.clip(rmin, 0.0, float(Hp - TH))
        return jnp.floor(v / 8.0) * 8.0

    def cstart(TW):
        v = jnp.clip(cmin, 0.0, float(Wp - TW))
        return jnp.floor(v / 128.0) * 128.0

    def mk(TH, TW):
        def branch():
            rs = rstart(TH)
            cs = cstart(TW)
            rs_i = pl.multiple_of(rs.astype(jnp.int32), 8)
            cs_i = pl.multiple_of(cs.astype(jnp.int32), 128)
            tile_hi = hi_ref[pl.ds(rs_i, TH), pl.ds(cs_i, TW)]
            tile_lo = lo_ref[pl.ds(rs_i, TH), pl.ds(cs_i, TW)]
            # column selection for ALL flat outputs in one matmul:
            # (TH, TW) @ (TW, NOUT) — contraction TW keeps the MXU fed
            col_iota = lax.broadcasted_iota(jnp.int32, (TW, NOUT), 0
                                            ).astype(f32)
            E2 = (col_iota == (pu - cs)).astype(_BF)
            Q = (jnp.dot(tile_hi, E2, preferred_element_type=f32,
                         precision=lax.Precision.DEFAULT)
                 + jnp.dot(tile_lo, E2, preferred_element_type=f32,
                           precision=lax.Precision.DEFAULT))
            # row selection: elementwise one-hot + sublane reduction
            row_iota = lax.broadcasted_iota(jnp.int32, (TH, NOUT), 0
                                            ).astype(f32)
            E1 = (row_iota == (pw - rs)).astype(f32)
            val = jnp.sum(Q * E1, axis=0, keepdims=True)   # (1, NOUT)
            if inb is not None:
                val = jnp.where(inb, val, 0.0)
            out_ref[:] = val.reshape(SBK, LBK)
        return branch

    done = jnp.asarray(False)
    for TH, TW in rungs:
        fits = ((rmax < rstart(TH) + float(TH))
                & (cmax < cstart(TW) + float(TW)))
        take = fits & ~done

        @pl.when(take)
        def _(TH=TH, TW=TW):
            mk(TH, TW)()
        done = done | fits


@functools.partial(jax.jit, static_argnames=("nS", "nL", "SBK", "LBK",
                                             "round_half", "mask_oob",
                                             "grid_coords", "interpret"))
def _warp_pallas(img, M, nS: int, nL: int, SBK: int = 16,
                 LBK: int = 128, round_half: bool = True,
                 mask_oob: bool = True, grid_coords: bool = True,
                 interpret: bool = False):
    from emfusion_tpu.ops.fusion_pencil import _split_bf16
    f32 = jnp.float32
    H, W = img.shape
    img = img.astype(f32)
    hi, lo = _split_bf16(img)
    m = jnp.asarray(M, f32).reshape(1, 16)

    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    if (Hp, Wp) != (H, W):
        hi = jnp.pad(hi, ((0, Hp - H), (0, Wp - W)))
        lo = jnp.pad(lo, ((0, Hp - H), (0, Wp - W)))
    # (rows, cols) window rungs; the full image is always the last rung.
    # TH sets the row-select cost and the matmul M; TW sets both the
    # one-hot compare count (TW x NOUT) and the matmul contraction —
    # the ladder steps TH finely at the smallest TW that covers a
    # same-scale warp tile before widening TW (bench hit: (48, 256)).
    rungs = [(th, tw) for th, tw in ((16, 256), (32, 256), (48, 256),
                                     (64, 384), (96, 512), (128, 640))
             if th < Hp and tw < Wp]
    rungs.append((Hp, Wp))
    rungs = tuple(rungs)

    nSp = -(-nS // SBK) * SBK
    nLp = -(-nL // LBK) * LBK
    kern = functools.partial(_warp_kernel, nS=nS, nL=nL, SBK=SBK,
                             LBK=LBK, rungs=rungs,
                             round_half=round_half, mask_oob=mask_oob,
                             H=H, W=W, grid_coords=grid_coords)
    out = pl.pallas_call(
        kern,
        grid=(nSp // SBK, nLp // LBK),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp, Wp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Wp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SBK, LBK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nSp, nLp), f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(m, hi, lo)
    return out[:nS, :nL]


def warp_image_to_grid_pallas(img, Bmat, H: int, W: int, a0, b0, da, db,
                              nS: int, nL: int, SBK: int = 16,
                              interpret: bool = False):
    """Drop-in for :func:`fusion_pencil.warp_image_to_grid` backed by the
    Pallas warp kernel. The B-coord grid spec rides along in the scalar
    operand: (l, s) -> (a0+(l+.5)/nL*da, b0+(s+.5)/nS*db) -> Bmat
    homography -> nearest pixel. Coordinate math replicates the XLA
    path's op order; isolated half-integer rounding boundaries may still
    flip one pixel (different FMA contraction across compilers)."""
    f32 = jnp.float32
    Bmat = jnp.asarray(Bmat, f32)
    M = jnp.concatenate([
        Bmat.reshape(9),
        jnp.stack([jnp.asarray(a0, f32), jnp.asarray(b0, f32),
                   jnp.asarray(da, f32), jnp.asarray(db, f32)]),
        jnp.zeros((3,), f32),
    ])
    return _warp_pallas(img, M, nS, nL, SBK=SBK, round_half=True,
                        mask_oob=True, interpret=interpret)


def select_grid_at_pixels_pallas(grid, Binv, a0, b0, da, db,
                                 H: int, W: int, SBK: int = 16,
                                 interpret: bool = False):
    """Sweep-raycast warp-back (``ops/raycast_sweep.py``): for every
    pixel, look up the B-grid cell its ray passes through —
    ``grid[clip(floor((b-b0)/db*SB)), clip(floor((a-a0)/da*LB))]`` with
    (a, b) = dehomogenized ``Binv @ (x, y, 1)``. Composes the grid-index
    scaling into the homography (floor, clip-only: no out-of-bounds
    zeroing, matching the clip semantics of the XLA path)."""
    f32 = jnp.float32
    SB, LB = grid.shape
    Binv = jnp.asarray(Binv, f32)
    zero = jnp.asarray(0.0, f32)
    sa = jnp.asarray(LB, f32) / jnp.asarray(da, f32)
    sb = jnp.asarray(SB, f32) / jnp.asarray(db, f32)
    S = jnp.stack([
        jnp.stack([sa, zero, -jnp.asarray(a0, f32) * sa]),
        jnp.stack([zero, sb, -jnp.asarray(b0, f32) * sb]),
        jnp.stack([zero, zero, jnp.asarray(1.0, f32)]),
    ])
    M = jnp.concatenate([(S @ Binv).reshape(9), jnp.zeros((7,), f32)])
    return _warp_pallas(grid, M, nS=H, nL=W, SBK=SBK, round_half=False,
                        mask_oob=False, grid_coords=False,
                        interpret=interpret)
