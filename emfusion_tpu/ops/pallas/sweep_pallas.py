"""Pallas TPU kernel for the B-space plane-sweep: raycast + along-ray
point sampling.

Production TPU path for ``kernel_raycastTSDF``
(``src/core/cuda/TSDF.cu:466-601``) and for the E-step's per-pixel TSDF
sample (``TSDF::computeLaplace``, ``src/core/TSDF.cpp:138-156``),
replacing the XLA ``lax.scan`` sweep (``ops/raycast_sweep.py``, measured
~19 ms at 512^3 on v5e) and the XLA per-point gather E-step (~46 ms at
full res — XLA:TPU gathers run a ~0.075 G elem/s scalar loop).

Same mathematical structure as the XLA sweep: in reference-plane
("B-space") coordinates every camera ray is a B-grid column; sweeping
the volume z-slices, each slice is resampled onto the B-grid with two
separable 2-tap linear-interpolation matrix products. What the kernel
adds over the XLA scan:

  * the volume slices stream HBM->VMEM **at the storage dtype** (bf16 in
    production — half the traffic; the XLA path materializes an f32
    copy of the whole volume first);
  * the interpolation matrices are generated on the fly in VMEM (iota
    compares, bf16) and the resample runs as bf16 MXU chains with f32
    accumulation (fields are bf16-stored in production, so the only
    extra rounding is the 2-tap blend weight quantization, ~2^-9);
  * the running zero-crossing scan state (previous sample, running best
    front/back crossings, the sampled-at-point accumulator) lives in
    VMEM scratch across the whole sweep — nothing but the final (SB,LB)
    grids ever returns to HBM.

The B-grid is tiled along lanes (grid = (LB/LBT tiles, Z slices)); each
tile re-streams the volume, trading DMA (which overlaps the MXU work)
for scratch that fits VMEM.

Two fused capabilities, selected statically:
  * ``with_ray``: per-column min-t front crossing (+ back-face culling)
    -> t* grid; weights field required (crossing validity tests).
  * ``with_pts``: given per-column target distances t_pt (the pixel
    points' |p| warped to B-space), linearly interpolate the swept field
    between the two bracketing slice crossings -> psi-at-point grid
    (the E-step sample; equals sampling the TSDF along the ray with
    in-plane bilinear + between-crossing linear interpolation — the
    same order of deviation from exact trilinear as the sweep raycast,
    documented in ``ops/raycast_sweep.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emfusion_tpu.ops.fusion_pencil import (
    AXIS_COORD, AXIS_TRANSPOSE, _pencil_setup, _window_from_quad,
)
from emfusion_tpu.ops.raycast_sweep import (
    sweep_outputs_from_tstar_grid, warp_grid_to_pixels,
)

_BF = jnp.bfloat16
_BIG = 1e30
_BIG_HALF = 1e29


def _sweep_kernel(*refs, X: int, Y: int, SB: int, LBT: int, Z: int,
                  with_ray: bool, with_pts: bool):
    f32 = jnp.float32
    it = iter(refs)
    coef_ref = next(it)
    glob_ref = next(it)
    t_ref = next(it)
    w_ref = next(it) if with_ray else None
    tpt_ref = next(it) if with_pts else None
    ts_ref = next(it) if with_ray else None
    psi_ref = next(it) if with_pts else None
    prev_psi = next(it)
    prev_t = next(it)
    prev_w = next(it) if with_ray else None
    best_ft = next(it) if with_ray else None
    best_bt = next(it) if with_ray else None
    psi_pt = next(it) if with_pts else None

    ti = pl.program_id(0)
    z = pl.program_id(1)

    @pl.when(z == 0)
    def _():
        prev_t[:] = jnp.full((SB, LBT), _BIG, f32)
        prev_psi[:] = jnp.zeros((SB, LBT), f32)
        if with_ray:
            prev_w[:] = jnp.zeros((SB, LBT), f32)
            best_ft[:] = jnp.full((SB, LBT), _BIG, f32)
            best_bt[:] = jnp.full((SB, LBT), _BIG, f32)
        if with_pts:
            psi_pt[:] = jnp.full((SB, LBT), _BIG, f32)

    kx, cx = coef_ref[z, 0], coef_ref[z, 1]
    ky, cy = coef_ref[z, 2], coef_ref[z, 3]
    cc0, cc1, cc2 = coef_ref[z, 4], coef_ref[z, 5], coef_ref[z, 6]
    capx0, capx1, capx2 = glob_ref[0, 0], glob_ref[0, 1], glob_ref[0, 2]
    capy0, capy1, capy2 = glob_ref[0, 3], glob_ref[0, 4], glob_ref[0, 5]

    l0 = (ti * LBT).astype(f32)
    l = lax.broadcasted_iota(jnp.int32, (1, LBT), 1).astype(f32) + l0
    s = lax.broadcasted_iota(jnp.int32, (SB, 1), 0).astype(f32)
    p = kx * l + cx                    # (1, LBT) volume x coord
    q = ky * s + cy                    # (SB, 1)  volume y coord

    # 2-tap linear interpolation matrices (ops/raycast_sweep's
    # _linear_matrix semantics: out-of-range columns all-zero)
    c0x = jnp.floor(p)
    fx_ = p - c0x
    okx = (p >= 0.0) & (p <= X - 1.0)
    rowsx = lax.broadcasted_iota(jnp.int32, (X, LBT), 0).astype(f32)
    Ecol = jnp.where(okx, (rowsx == c0x) * (1.0 - fx_)
                     + (rowsx == c0x + 1.0) * fx_, 0.0).astype(_BF)
    c0y = jnp.floor(q)
    fy_ = q - c0y
    oky = (q >= 0.0) & (q <= Y - 1.0)
    colsy = lax.broadcasted_iota(jnp.int32, (SB, Y), 1).astype(f32)
    Erow = jnp.where(oky, (colsy == c0y) * (1.0 - fy_)
                     + (colsy == c0y + 1.0) * fy_, 0.0).astype(_BF)

    prec = lax.Precision.DEFAULT

    def resample(field_ref):
        sl = field_ref[0].astype(_BF)                       # (Y, X)
        tmp = jnp.dot(sl, Ecol, preferred_element_type=f32,
                      precision=prec)                       # (Y, LBT)
        return jnp.dot(Erow, tmp.astype(_BF),
                       preferred_element_type=f32, precision=prec)

    psi = resample(t_ref)                                   # (SB, LBT)

    pg = jnp.broadcast_to(p, (SB, LBT))
    qg = jnp.broadcast_to(q, (SB, LBT))
    camx = capx0 * pg + capy0 * qg + cc0
    camy = capx1 * pg + capy1 * qg + cc1
    camz = capx2 * pg + capy2 * qg + cc2
    t = jnp.sqrt(camx * camx + camy * camy + camz * camz)
    ok = (jnp.broadcast_to((p >= 0.0) & (p <= X - 2.0), (SB, LBT))
          & jnp.broadcast_to((q >= 0.0) & (q <= Y - 2.0), (SB, LBT))
          & (camz > 0.0))
    tval = jnp.where(ok, t, _BIG)

    ptv = prev_t[:]
    ppsi = prev_psi[:]
    pair = ok & (ptv < _BIG_HALF)
    swap = tval < ptv
    psi_n = jnp.where(swap, psi, ppsi)
    psi_f = jnp.where(swap, ppsi, psi)
    t_n = jnp.minimum(tval, ptv)
    t_f = jnp.maximum(tval, ptv)

    if with_ray:
        wv = resample(w_ref)
        pw = prev_w[:]
        w_n = jnp.where(swap, wv, pw)
        w_f = jnp.where(swap, pw, wv)
        denom = psi_f - psi_n
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        frac = -psi_n / denom
        ts = t_n + frac * (t_f - t_n)
        wstar = w_n + frac * (w_f - w_n)
        front = pair & (psi_n > 0.0) & (psi_f < 0.0) & (wstar > 0.0)
        bf = best_ft[:]
        best_ft[:] = jnp.where(front & (ts < bf), ts, bf)
        back = pair & (psi_n < 0.0) & (psi_f > 0.0) & (w_f > 0.0)
        bb = best_bt[:]
        best_bt[:] = jnp.where(back & (t_f < bb), t_f, bb)
        prev_w[:] = wv

    if with_pts:
        tpt = tpt_ref[:]
        cur = psi_pt[:]
        dt_ = t_f - t_n
        fr = jnp.where(dt_ > 1e-30, (tpt - t_n) / jnp.where(
            dt_ > 1e-30, dt_, 1.0), 0.0)
        val = psi_n + fr * (psi_f - psi_n)
        take = pair & (t_n <= tpt) & (tpt < t_f) & (cur >= _BIG_HALF)
        psi_pt[:] = jnp.where(take, val, cur)

    prev_psi[:] = psi
    prev_t[:] = tval

    @pl.when(z == Z - 1)
    def _():
        if with_ray:
            bf = best_ft[:]
            hit = (bf < _BIG_HALF) & (bf < best_bt[:])
            ts_ref[:] = jnp.where(hit, bf, 0.0)
        if with_pts:
            cur = psi_pt[:]
            psi_ref[:] = jnp.where(cur < _BIG_HALF, cur, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "SB", "LB", "LBT", "with_ray", "with_pts", "interpret"))
def _sweep_call(tsdf, weights, tpt_B, coef, glob, SB: int, LB: int,
                LBT: int, with_ray: bool, with_pts: bool,
                interpret: bool = False):
    Z, Y, X = tsdf.shape
    f32 = jnp.float32
    NT = LB // LBT
    grid = (NT, Z)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    vol_spec = vmem((1, Y, X), lambda t, z: (z, 0, 0))
    tile_spec = vmem((SB, LBT), lambda t, z: (0, t))

    in_specs = [smem((Z, 8), lambda t, z: (0, 0)),
                smem((1, 8), lambda t, z: (0, 0)),
                vol_spec]
    args = [coef, glob, tsdf]
    if with_ray:
        in_specs.append(vol_spec)
        args.append(weights)
    if with_pts:
        in_specs.append(tile_spec)
        args.append(tpt_B)

    out_specs = []
    out_shape = []
    if with_ray:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((SB, LB), f32))
    if with_pts:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((SB, LB), f32))

    scratch = [pltpu.VMEM((SB, LBT), f32),    # prev_psi
               pltpu.VMEM((SB, LBT), f32)]    # prev_t
    if with_ray:
        scratch += [pltpu.VMEM((SB, LBT), f32)] * 3   # prev_w, bft, bbt
    if with_pts:
        scratch.append(pltpu.VMEM((SB, LBT), f32))    # psi_pt

    nfields = 2 if with_ray else 1
    esize = jnp.dtype(tsdf.dtype).itemsize
    flops = 2 * NT * Z * nfields * (Y * X * LBT + SB * Y * LBT)
    kern = functools.partial(_sweep_kernel, X=X, Y=Y, SB=SB, LBT=LBT,
                             Z=Z, with_ray=with_ray, with_pts=with_pts)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=NT * Z * Y * X * esize * nfields
            + SB * LB * 4 * (len(out_shape) + (1 if with_pts else 0)),
            transcendentals=NT * Z * SB * LBT),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return outs


def _coef_glob(abg, camc, capx, capy, a0, b0, da, db, SB, LB):
    f32 = jnp.float32
    gamma = abg[:, 2]
    kx = gamma * (da / LB)
    cx = gamma * (a0 + 0.5 * da / LB) - abg[:, 0]
    ky = gamma * (db / SB)
    cy = gamma * (b0 + 0.5 * db / SB) - abg[:, 1]
    coef = jnp.stack([kx, cx, ky, cy, camc[:, 0], camc[:, 1],
                      camc[:, 2], jnp.zeros_like(kx)], axis=1
                     ).astype(f32)                         # (Z, 8)
    glob = jnp.concatenate([capx.astype(f32), capy.astype(f32),
                            jnp.zeros((2,), f32)])[None, :]  # (1, 8)
    return coef, glob


def _grid_dims(H, W, oversample, grid):
    if grid is not None:
        return grid
    SB = int(-(-int(H * oversample) // 8) * 8)
    LB = int(-(-int(W * oversample) // 128) * 128)
    return SB, LB


def _pick_lbt(LB: int, SB: int = 0, with_ray: bool = True) -> int:
    """Lane-tile width. Full-width (LBT == LB, one tile) streams the
    volume ONCE instead of LB/LBT times — the sweep is DMA-bound, so
    this is ~NT-fold less HBM traffic (r4 NOTES lead, unlocked by
    raising the scoped-VMEM limit: the scratch is ~6 x (SB, LB) f32
    ~= 13 MB at the reference point, over the 16 MB default cap)."""
    if SB:
        scratch_mb = (6 * SB * LB * 4) / 1e6
        if scratch_mb <= 48.0:
            return LB
    for lbt in (256, 128):
        if LB % lbt == 0:
            return lbt
    return LB


def _relabel(tsdf_vol, weights_vol, rel_rot_co, rel_trans_co, axis):
    if axis == 2:
        return tsdf_vol, weights_vol, rel_rot_co, rel_trans_co
    tsdf_vol = jnp.transpose(tsdf_vol, AXIS_TRANSPOSE[axis])
    if weights_vol is not None:
        weights_vol = jnp.transpose(weights_vol, AXIS_TRANSPOSE[axis])
    perm = jnp.asarray(AXIS_COORD[axis], jnp.int32)
    return (tsdf_vol, weights_vol, rel_rot_co[perm, :],
            rel_trans_co[perm])


def _points_t_image(points_cam):
    """Per-pixel target ray distance |p| (0 where invalid: z <= 0)."""
    t = jnp.sqrt(jnp.sum(points_cam * points_cam, axis=0))
    return jnp.where(points_cam[2] > 0.0, t, 0.0).astype(jnp.float32)


def _warp_tpt(tpt_img, Bmat, H, W, a0, b0, da, db, SB, LB, interpret):
    if interpret or jax.default_backend() in ("cpu",):
        from emfusion_tpu.ops.fusion_pencil import warp_image_to_grid
        return warp_image_to_grid(tpt_img, Bmat, H, W, a0, b0, da, db,
                                  SB, LB)
    from emfusion_tpu.ops.pallas.warp_pallas import (
        warp_image_to_grid_pallas)
    return warp_image_to_grid_pallas(tpt_img, Bmat, H, W, a0, b0, da,
                                     db, SB, LB)


def raycast_sweep_pallas(tsdf_vol, weights_vol, rel_rot_co, rel_trans_co,
                         intr, voxel_size, truncdist, height: int,
                         width: int, prev_raylengths=None,
                         oversample: float = 1.25, grid=None,
                         axis: int = 2, points_cam=None,
                         interpret: bool = False):
    """Pallas drop-in for :func:`ops.raycast_sweep.raycast_sweep`.

    ``points_cam``: optional (3, H, W) camera-space points; when given,
    the result dict gains ``"psi_pt"`` — the TSDF sampled along each
    pixel's ray at the point's distance (the E-step sample, fused into
    the same sweep; 0 where unsampled/invalid).
    """
    H, W = height, width
    tsdf_vol = jnp.asarray(tsdf_vol)
    weights_vol = jnp.asarray(weights_vol)
    rel_rot_co = jnp.asarray(rel_rot_co, jnp.float32)
    rel_trans_co = jnp.asarray(rel_trans_co, jnp.float32)
    tsdf_vol, weights_vol, rel_rot_co, rel_trans_co = _relabel(
        tsdf_vol, weights_vol, rel_rot_co, rel_trans_co, axis)
    Z, Y, X = tsdf_vol.shape
    R_oc = rel_rot_co.T
    t_oc = -R_oc @ rel_trans_co
    intr = jnp.asarray(intr, jnp.float32)
    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        R_oc, t_oc, intr, jnp.float32(voxel_size), Z, Y, X)
    a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=X, Y=Y)
    SB, LB = _grid_dims(H, W, oversample, grid)
    coef, glob = _coef_glob(abg, camc, capx, capy, a0, b0, da, db, SB, LB)

    with_pts = points_cam is not None
    tpt_B = None
    if with_pts:
        tpt_img = _points_t_image(jnp.asarray(points_cam, jnp.float32))
        tpt_B = _warp_tpt(tpt_img, Bmat, H, W, a0, b0, da, db, SB, LB,
                          interpret)
    outs = _sweep_call(tsdf_vol, weights_vol, tpt_B, coef, glob,
                       SB=SB, LB=LB, LBT=_pick_lbt(LB, SB, True),
                       with_ray=True,
                       with_pts=with_pts, interpret=interpret)
    ts_B = outs[0]
    out = sweep_outputs_from_tstar_grid(ts_B, Binv, a0, b0, da, db,
                                        intr, H, W)
    if with_pts:
        out["psi_pt"] = warp_grid_to_pixels(outs[1], Binv, a0, b0, da,
                                            db, H, W)
    if prev_raylengths is not None:
        keep = (prev_raylengths == 0.0) | \
            (out["raylengths"] <= prev_raylengths)
        out["raylengths"] = jnp.where(keep, out["raylengths"], 0.0)
        out["vertices"] = jnp.where(keep[None], out["vertices"], 0.0)
        out["normals"] = jnp.where(keep[None], out["normals"], 0.0)
        out["mask"] = out["mask"] & keep
    return out


def sweep_sample_psi_pallas(tsdf_vol, points_cam, rel_rot_co,
                            rel_trans_co, intr, voxel_size,
                            oversample: float = 1.25, grid=None,
                            axis: int = 2, interpret: bool = False):
    """Sweep-based E-step TSDF sample: psi at each pixel's point.

    Pallas replacement for the background model's
    ``sample_volume_at_points`` in ``ops.association.compute_laplace``
    (reference ``TSDF.cpp:138-156``): one streaming pass over the volume
    instead of a per-point scalar gather. ``points_cam`` is (3, h, w)
    (possibly a subsampled pixel grid — pass the matching ``intr``).
    Returns (h, w) psi with 0 = invalid/unsampled (the reference's
    exact-zero sentinel semantics).
    """
    points_cam = jnp.asarray(points_cam, jnp.float32)
    _, H, W = points_cam.shape
    tsdf_vol = jnp.asarray(tsdf_vol)
    rel_rot_co = jnp.asarray(rel_rot_co, jnp.float32)
    rel_trans_co = jnp.asarray(rel_trans_co, jnp.float32)
    tsdf_vol, _, rel_rot_co, rel_trans_co = _relabel(
        tsdf_vol, None, rel_rot_co, rel_trans_co, axis)
    Z, Y, X = tsdf_vol.shape
    R_oc = rel_rot_co.T
    t_oc = -R_oc @ rel_trans_co
    intr = jnp.asarray(intr, jnp.float32)
    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        R_oc, t_oc, intr, jnp.float32(voxel_size), Z, Y, X)
    a0, b0, da, db = _window_from_quad(Binv, H, W, abg=abg, X=X, Y=Y)
    SB, LB = _grid_dims(H, W, oversample, grid)
    coef, glob = _coef_glob(abg, camc, capx, capy, a0, b0, da, db, SB, LB)
    tpt_img = _points_t_image(points_cam)
    tpt_B = _warp_tpt(tpt_img, Bmat, H, W, a0, b0, da, db, SB, LB,
                      interpret)
    outs = _sweep_call(tsdf_vol, None, tpt_B, coef, glob, SB=SB, LB=LB,
                       LBT=_pick_lbt(LB, SB, False), with_ray=False,
                       with_pts=True,
                       interpret=interpret)
    return warp_grid_to_pixels(outs[0], Binv, a0, b0, da, db, H, W)
