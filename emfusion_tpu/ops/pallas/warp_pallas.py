"""Pallas TPU kernel for projective image->grid warps.

Replaces the stage-1 pencil warp gather (``kernel_updateTSDF``'s
per-voxel depth lookup factored to a per-frame resample,
``src/core/cuda/TSDF.cu:344-356``) and the sweep raycast's pixel->B-grid
warp-back. XLA:TPU lowers the straightforward 537k-element gather to a
~0.11 G elem/s scalar loop (~5-6 ms/frame measured on v5e); the XLA
one-hot matmul formulation materializes an (outputs x W) intermediate in
HBM per row block, which costs nearly as much.

This kernel keeps the source image resident in VMEM (bf16 hi/lo split;
~1.2 MB for 640x480). Each program produces an (SBK, LBK) output tile;
the tile's source pixels span a bounded image window (a projective map
sends a small output rectangle to a small quad), so a dynamic 2-D
window slice of the smallest fitting ladder rung feeds the selection:

  * coords on the VPU from the homography scalars (SMEM);
  * per output sub-row: column selection Q = window (TH, TW) @ one-hot
    (TW, LBK) on the MXU (bf16 hi/lo -> ~4e-6 relative);
  * row selection as an elementwise one-hot multiply + sublane
    reduction -> a lane-oriented (1, LBK) row, no relayouts.

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

    l0 = pl.program_id(1) * LBK
    s0 = pl.program_id(0) * SBK
    li = (lax.broadcasted_iota(jnp.int32, (1, LBK), 1) + l0).astype(f32)
    if grid_coords:
        # bit-identical coords to fusion_pencil.warp_image_to_grid: same
        # f32 op order ((l+0.5)/nL*da + a0, then 2-term homography sums)
        ag = (li + 0.5) / float(nL) * da + a0
    else:
        ag = li

    pus, pws, inbs = [], [], []
    rmin = jnp.asarray(jnp.inf, f32)
    rmax = jnp.asarray(-jnp.inf, f32)
    cmin = jnp.asarray(jnp.inf, f32)
    cmax = jnp.asarray(-jnp.inf, f32)
    off = 0.5 if round_half else 0.0
    for r in range(SBK):
        s = (s0 + r).astype(f32)
        if grid_coords:
            bg = (s + 0.5) / float(nS) * db + b0
        else:
            bg = s
        hu = m00 * ag + m01 * bg + m02
        hw = m10 * ag + m11 * bg + m12
        hz = m20 * ag + m21 * bg + m22
        zs = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
        ug = hu / zs
        wg = hw / zs
        pu = jnp.clip(jnp.floor(ug + off), 0.0, W - 1.0)
        pw = jnp.clip(jnp.floor(wg + off), 0.0, H - 1.0)
        pus.append(pu)
        pws.append(pw)
        if mask_oob:
            inbs.append((ug > -0.5) & (ug < W - 0.5) & (wg > -0.5)
                        & (wg < H - 0.5) & (hz > 0.0))
        else:
            inbs.append(None)
        rmin = jnp.minimum(rmin, jnp.min(pw))
        rmax = jnp.maximum(rmax, jnp.max(pw))
        cmin = jnp.minimum(cmin, jnp.min(pu))
        cmax = jnp.maximum(cmax, jnp.max(pu))

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
            col_sub = lax.broadcasted_iota(jnp.int32, (TW, 1), 0
                                           ).astype(f32)
            row_sub = lax.broadcasted_iota(jnp.int32, (TH, 1), 0
                                           ).astype(f32)
            for r in range(SBK):
                E2 = (col_sub == (pus[r] - cs)).astype(_BF)  # (TW, LBK)
                Q = (jnp.dot(tile_hi, E2, preferred_element_type=f32,
                             precision=lax.Precision.DEFAULT)
                     + jnp.dot(tile_lo, E2, preferred_element_type=f32,
                               precision=lax.Precision.DEFAULT))
                E1 = (row_sub == (pws[r] - rs)).astype(f32)  # (TH, LBK)
                val = jnp.sum(Q * E1, axis=0, keepdims=True)
                if inbs[r] is not None:
                    val = jnp.where(inbs[r], val, 0.0)
                out_ref[r:r + 1, :] = val
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
def _warp_pallas(img, M, nS: int, nL: int, SBK: int = 8, LBK: int = 128,
                 round_half: bool = True, mask_oob: bool = True,
                 grid_coords: bool = True, interpret: bool = False):
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
    # (rows, cols) window rungs; the full image is always the last rung
    rungs = [(th, tw) for th, tw in ((16, 256), (64, 384), (128, 512))
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
        interpret=interpret,
    )(m, hi, lo)
    return out[:nS, :nL]


def warp_image_to_grid_pallas(img, Bmat, H: int, W: int, a0, b0, da, db,
                              nS: int, nL: int, SBK: int = 8,
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
                                 H: int, W: int, SBK: int = 8,
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
