"""Pallas TPU kernels for the banded sweep-capture
(``geometry/band_capture.py``).

Two kernels replace the ~140 ms per-point capture gather with ~5 ms of
streaming/MXU work (the dominant cost of the SLAM frame, NOTES_R3.md):

K1 ``_band_kernel`` — band build. Grid (LB/LBT tiles, Z slices); each
   slice streams HBM->VMEM at the storage dtype, is resampled onto the
   B-grid with two separable 2-tap linear bf16 matmuls (the sweep
   resample), and deposited into the (BAND, SB, LB) per-column z-band
   outputs (bf16, resident in VMEM across the sweep; sentinel = inf
   for never-written entries).

K2 ``_extract_kernel`` — band -> per-point capture caches. Grid over
   (16 x 32)-pixel point tiles (the caller reorders the raster point
   arrays into tile-major order). The full band stays VMEM-resident;
   for each of PLANES consecutive z-slices covering the tile's depth
   range, a dynamic (SW, LW) window of the plane is materialized by
   slot-select from the band, and the tile's 6 x-taps per point are
   gathered with a 2-tap linear one-hot matmul (MXU) followed by a
   2-tap row blend (VPU) per y-tap — per-point work never touches HBM.
   A third "validity" chain runs the same interpolation over the
   plane's 0/1 validity; a tap is served iff its blended validity is
   exactly 1, and a point with ANY unserved tap has its whole cache
   zeroed (the XLA reference's semantics).

Cache layout returned to the caller: (C, WIN, WIN, WIN, N) f32 +
(3, N) anchors — identical to ``geometry.capture.capture_neighborhoods``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emfusion_tpu.geometry.band_capture import (
    AZ_BIAS, BAND, BSTART, BandPack, decode_bstart, pack_from_points,
    pencil_at_pose,
)
from emfusion_tpu.geometry.capture import WIN, _ANCHOR_OFF
from emfusion_tpu.geometry.sampling import _transform_to_grid

_BF = jnp.bfloat16
_BIG = 1e30
_BIG_HALF = 1e29

# K2 point-tile geometry
TH, TW = 8, 32           # pixel tile -> NPT = 256 points
NPT = TH * TW
SW = 64                  # plane row window (sublane-aligned)
LW = 256                 # plane lane window (128-aligned)
PLANES = 24              # z-planes per tile


# ----------------------------------------------------------------------
# K1: band build
# ----------------------------------------------------------------------

def _band_kernel(coef_ref, bst_ref, t_ref, w_ref, bt_ref, bw_ref, *,
                 X: int, Y: int, SB: int, LBT: int, Z: int):
    f32 = jnp.float32
    ti = pl.program_id(0)
    z = pl.program_id(1)

    @pl.when(z == 0)
    def _():
        bt_ref[:] = jnp.full((BAND, SB, LBT), _BIG, bt_ref.dtype)
        bw_ref[:] = jnp.full((BAND, SB, LBT), _BIG, bw_ref.dtype)

    kx, cx = coef_ref[z, 0], coef_ref[z, 1]
    ky, cy = coef_ref[z, 2], coef_ref[z, 3]
    l0 = (ti * LBT).astype(f32)
    l = lax.broadcasted_iota(jnp.int32, (1, LBT), 1).astype(f32) + l0
    s = lax.broadcasted_iota(jnp.int32, (SB, 1), 0).astype(f32)
    p = kx * l + cx                    # (1, LBT) volume x coord
    q = ky * s + cy                    # (SB, 1)  volume y coord

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
        sl = field_ref[0].astype(_BF)
        tmp = jnp.dot(sl, Ecol, preferred_element_type=f32,
                      precision=prec)
        return jnp.dot(Erow, tmp.astype(_BF),
                       preferred_element_type=f32, precision=prec)

    psi = resample(t_ref)
    wv = resample(w_ref)
    ok = jnp.broadcast_to(okx, (SB, LBT)) \
        & jnp.broadcast_to(oky, (SB, LBT))

    d = z - bst_ref[:].astype(jnp.int32)          # (SB, LBT)
    for dd in range(BAND):
        take = (d == dd) & ok
        bt_ref[dd] = jnp.where(take, psi.astype(bt_ref.dtype),
                               bt_ref[dd])
        bw_ref[dd] = jnp.where(take, wv.astype(bw_ref.dtype),
                               bw_ref[dd])


@functools.partial(jax.jit, static_argnames=("SB", "LB", "LBT",
                                             "interpret"))
def _band_call(tsdf, weights, bstart_f, coef, SB: int, LB: int,
               LBT: int, interpret: bool = False):
    Z, Y, X = tsdf.shape
    NT = LB // LBT
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    vol_spec = vmem((1, Y, X), lambda t, z: (z, 0, 0))
    band_spec = vmem((BAND, SB, LBT), lambda t, z: (0, 0, t))
    kern = functools.partial(_band_kernel, X=X, Y=Y, SB=SB, LBT=LBT,
                             Z=Z)
    esize = jnp.dtype(tsdf.dtype).itemsize
    return pl.pallas_call(
        kern,
        grid=(NT, Z),
        in_specs=[smem((Z, 8), lambda t, z: (0, 0)),
                  vmem((SB, LBT), lambda t, z: (0, t)),
                  vol_spec, vol_spec],
        out_specs=(band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((BAND, SB, LB), _BF),
                   jax.ShapeDtypeStruct((BAND, SB, LB), _BF)),
        cost_estimate=pl.CostEstimate(
            flops=2 * NT * Z * 2 * (Y * X * LBT + SB * Y * LBT),
            bytes_accessed=NT * Z * Y * X * esize * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coef, bstart_f, tsdf, weights)


# ----------------------------------------------------------------------
# K2: extraction
# ----------------------------------------------------------------------

def _extract_kernel(pack_ref, bt_ref, bw_ref, bst_ref, ax_ref, ay_ref,
                    az_ref, ct_ref, cw_ref, ok_ref, *, SB: int, LB: int,
                    sw: int, lw: int, Z: int):
    f32 = jnp.float32
    A0a, A1a = pack_ref[0, 0], pack_ref[0, 1]
    B0a, B1a = pack_ref[0, 2], pack_ref[0, 3]
    G0a, G1a = pack_ref[0, 4], pack_ref[0, 5]
    a0, b0 = pack_ref[0, 6], pack_ref[0, 7]
    da, db = pack_ref[0, 8], pack_ref[0, 9]

    ax = ax_ref[:]                      # (1, NPT) f32
    ay = ay_ref[:]
    az = az_ref[:]

    # tile windows from the point anchors (smooth pixel->B map).
    # Only anchors that could intersect the volume count — points far
    # outside (object volumes see mostly off-volume pixels) must not
    # drag the plane window away from the served points.
    rel = (az >= -float(WIN)) & (az <= float(Z))
    azr = jnp.where(rel, az, 1e6)
    base_z = jnp.min(azr)
    # a/b coords of the anchor corners over the plane range give the
    # window; use the per-point base coords at the central plane
    zc = base_z + PLANES * 0.5
    gz = G0a + zc * G1a
    gzs = jnp.where(jnp.abs(gz) < 1e-12,
                    jnp.where(gz < 0, -1e-12, 1e-12), gz)
    ga_c = ((ax + (A0a + zc * A1a)) / gzs - a0) / da * LB - 0.5
    gb_c = ((ay + (B0a + zc * B1a)) / gzs - b0) / db * SB - 0.5
    # margin: tap extent (WIN cells * cell-per-voxel variation across
    # planes) is bounded by the window slack; clamp into the grid
    l0i = jnp.clip(jnp.floor((jnp.min(ga_c) - 8.0) / 128.0) * 128.0,
                   0.0, float(max(LB - lw, 0)))
    s0i = jnp.clip(jnp.floor((jnp.min(gb_c) - 12.0) / 8.0) * 8.0,
                   0.0, float(max(SB - sw, 0)))
    l0 = pl.multiple_of(l0i.astype(jnp.int32), 128)
    s0 = pl.multiple_of(s0i.astype(jnp.int32), 8)

    bst_win = bst_ref[pl.ds(s0, sw), pl.ds(l0, lw)]     # (sw, lw) f32

    ct_ref[:] = jnp.zeros_like(ct_ref)
    cw_ref[:] = jnp.zeros_like(cw_ref)
    ok_ref[:] = jnp.zeros_like(ok_ref)

    rows_l = lax.broadcasted_iota(jnp.int32, (lw, WIN * NPT), 0
                                  ).astype(f32)
    rows_s = lax.broadcasted_iota(jnp.int32, (sw, NPT), 0).astype(f32)
    prec = lax.Precision.DEFAULT

    # planes beyond the tile's relevant anchor range serve nobody —
    # skip their whole body (tiles usually span only a few slices)
    maxz = jnp.max(jnp.where(rel, az, -1e6))

    for p in range(PLANES):
      @pl.when(base_z + float(p) <= maxz + (WIN - 1.0))
      def _(p=p):
        zp = base_z + float(p)
        alpha = A0a + zp * A1a
        beta = B0a + zp * B1a
        gamma = G0a + zp * G1a
        gs = jnp.where(jnp.abs(gamma) < 1e-12,
                       jnp.where(gamma < 0, -1e-12, 1e-12), gamma)

        # slot-select the plane window + its validity
        slot = zp - bst_win                              # (sw, lw)
        pt = jnp.zeros((sw, lw), f32)
        pw = jnp.zeros((sw, lw), f32)
        pv = jnp.zeros((sw, lw), f32)
        for dd in range(BAND):
            m = slot == dd
            vt = bt_ref[dd, pl.ds(s0, sw), pl.ds(l0, lw)].astype(f32)
            vw = bw_ref[dd, pl.ds(s0, sw), pl.ds(l0, lw)].astype(f32)
            good = m & (vt < _BIG_HALF)
            pt = jnp.where(good, vt, pt)
            pw = jnp.where(good, vw, pw)
            pv = jnp.where(good, 1.0, pv)

        # x-taps: ga(dx, n) affine in dx; columns j = dx*NPT + n
        gbase = ((ax + alpha) / gs - a0) / da * LB - 0.5 - l0.astype(f32)
        gstep = (1.0 / gs) / da * LB
        # (1, WIN*NPT): dx-major lanes
        gaj = jnp.concatenate(
            [gbase + float(dx) * gstep for dx in range(WIN)], axis=1)
        c0 = jnp.floor(gaj)
        fa = gaj - c0
        okj = (gaj >= 0.0) & (gaj <= lw - 1.0)
        Ea = jnp.where(okj, (rows_l == c0) * (1.0 - fa)
                       + (rows_l == c0 + 1.0) * fa, 0.0).astype(_BF)

        tA_t = jnp.dot(pt.astype(_BF), Ea, preferred_element_type=f32,
                       precision=prec)                  # (sw, WIN*NPT)
        tA_w = jnp.dot(pw.astype(_BF), Ea, preferred_element_type=f32,
                       precision=prec)
        tA_v = jnp.dot(pv.astype(_BF), Ea, preferred_element_type=f32,
                       precision=prec)

        for dy in range(WIN):
            gbj = ((ay + float(dy) + beta) / gs - b0) / db * SB \
                - 0.5 - s0.astype(f32)                  # (1, NPT)
            r0 = jnp.floor(gbj)
            fb = gbj - r0
            okb = (gbj >= 0.0) & (gbj <= sw - 1.0)
            wB = jnp.where(okb, (rows_s == r0) * (1.0 - fb)
                           + (rows_s == r0 + 1.0) * fb, 0.0)  # (sw,NPT)
            wB6 = jnp.concatenate([wB] * WIN, axis=1)   # (sw, WIN*NPT)
            o_t = jnp.sum(tA_t * wB6, axis=0, keepdims=True)
            o_w = jnp.sum(tA_w * wB6, axis=0, keepdims=True)
            o_v = jnp.sum(tA_v * wB6, axis=0, keepdims=True)
            # bf16 one-hot weights blur the partition-of-unity by
            # ~2^-9 per tap; 0.98 passes fully-valid taps and still
            # rejects any invalid cell with non-negligible weight
            o_v = jnp.where(o_v > 0.98, 1.0, 0.0)
            for dz in range(WIN):
                row = dz * WIN + dy
                m = az + float(dz) == zp                # (1, NPT)
                m6 = jnp.concatenate([m] * WIN, axis=1)  # (1, WIN*NPT)
                ct_ref[row:row + 1] = jnp.where(m6, o_t,
                                                ct_ref[row:row + 1])
                cw_ref[row:row + 1] = jnp.where(m6, o_w,
                                                cw_ref[row:row + 1])
                ok_ref[row:row + 1] = jnp.where(m6, o_v,
                                                ok_ref[row:row + 1])

    # whole-point validity: every tap of every row must be served
    vmin = jnp.min(ok_ref[:], axis=0, keepdims=True)    # (1, WIN*NPT)
    bad = (vmin < 0.5).astype(f32)
    # group-reduce over the WIN dx lane blocks with static slices
    badc = bad[:, 0:NPT]
    for dx in range(1, WIN):
        badc = badc + bad[:, dx * NPT:(dx + 1) * NPT]   # (1, NPT)
    pok = badc < 0.5                                    # (1, NPT)
    pok6 = jnp.concatenate([pok] * WIN, axis=1)         # (1, WIN*NPT)
    ct_ref[:] = jnp.where(pok6, ct_ref[:], 0.0)
    cw_ref[:] = jnp.where(pok6, cw_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("SB", "LB", "ntiles", "Z",
                                             "interpret"))
def _extract_call(band_t, band_w, bstart_f, packv, axt, ayt, azt,
                  SB: int, LB: int, ntiles: int, Z: int,
                  interpret: bool = False):
    f32 = jnp.float32
    sw = min(SW, SB)
    lw = min(LW, LB)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    full = lambda *shape: vmem(shape, lambda t: tuple(0 for _ in shape))
    pt_spec = vmem((1, NPT), lambda t: (0, t))
    out_spec = vmem((WIN * WIN, WIN * NPT), lambda t: (0, t))
    kern = functools.partial(_extract_kernel, SB=SB, LB=LB, sw=sw,
                             lw=lw, Z=Z)
    N = ntiles * NPT
    ct, cw = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[smem((1, 16), lambda t: (0, 0)),
                  full(BAND, SB, LB), full(BAND, SB, LB),
                  full(SB, LB),
                  pt_spec, pt_spec, pt_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((WIN * WIN, WIN * N), f32),
                   jax.ShapeDtypeStruct((WIN * WIN, WIN * N), f32)),
        scratch_shapes=[pltpu.VMEM((WIN * WIN, WIN * NPT), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=ntiles * PLANES * 3 * 2 * sw * lw * WIN * NPT,
            bytes_accessed=ntiles * (BAND * SB * LB * 4
                                     + 2 * WIN ** 3 * NPT * 4),
            transcendentals=0),
        interpret=interpret,
    )(packv, band_t, band_w, bstart_f, axt, ayt, azt)
    return ct, cw


# ----------------------------------------------------------------------
# wrapper
# ----------------------------------------------------------------------

def _tile_order(arr_flat, h, w, Hp, Wp, fill):
    """(N,) raster -> (ntiles*NPT,) tile-major with padding."""
    a = arr_flat.reshape(h, w)
    a = jnp.pad(a, ((0, Hp - h), (0, Wp - w)), constant_values=fill)
    a = a.reshape(Hp // TH, TH, Wp // TW, TW)
    a = jnp.transpose(a, (0, 2, 1, 3))
    return a.reshape(-1)


def _untile(cache_rows, h, w, Hp, Wp):
    """(36, WIN*Ntile) kernel layout -> (WIN, WIN, WIN, h*w) raster."""
    ntiles = (Hp // TH) * (Wp // TW)
    c = cache_rows.reshape(WIN, WIN, ntiles, WIN, NPT)
    c = jnp.transpose(c, (0, 1, 3, 2, 4))      # (dz, dy, dx, tile, n)
    c = c.reshape(WIN, WIN, WIN, Hp // TH, Wp // TW, TH, TW)
    c = jnp.transpose(c, (0, 1, 2, 3, 5, 4, 6))
    c = c.reshape(WIN, WIN, WIN, Hp, Wp)[:, :, :, :h, :w]
    return c.reshape(WIN, WIN, WIN, h * w)


def band_capture_pallas(vols, points_cam, rel_rot, rel_trans,
                        voxel_size, intr, h: int, w: int, SB: int,
                        LB: int, interpret: bool = False):
    """Pallas twin of ``geometry.band_capture.band_capture_xla``:
    same (cache (C,WIN,WIN,WIN,N), anchor (3,N)) contract (band values
    are bf16-rounded)."""
    C, Z, Y, X = vols.shape
    f32 = jnp.float32
    shape = (Z, Y, X)
    assert C == 2, "band capture expects (tsdf, weights) channel pair"
    Bmat, abg = pencil_at_pose(rel_rot, rel_trans, intr,
                               voxel_size, shape, h, w)
    vx, vy, vz, pz = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                        voxel_size, shape)
    pack = pack_from_points(abg, vx, vy, vz, pz)
    ax = jnp.floor(vx).astype(jnp.int32) - _ANCHOR_OFF
    ay = jnp.floor(vy).astype(jnp.int32) - _ANCHOR_OFF
    az = jnp.floor(vz).astype(jnp.int32) - _ANCHOR_OFF
    anchor = jnp.stack([ax, ay, az])

    a0, b0, da, db = pack.win[0], pack.win[1], pack.win[2], pack.win[3]
    az_img = jnp.where(pz > 0, jnp.floor(vz) + AZ_BIAS, 0.0
                       ).reshape(h, w).astype(f32)
    if interpret or jax.default_backend() in ("cpu",):
        from emfusion_tpu.geometry.band_capture import \
            warp_anchor_clamped
        azb = warp_anchor_clamped(az_img, Bmat, pack, SB, LB)
    else:
        # clip-mode nearest warp on the Pallas warp kernel
        from emfusion_tpu.ops.pallas.warp_pallas import _warp_pallas
        M = jnp.concatenate([
            jnp.asarray(Bmat, f32).reshape(9),
            jnp.stack([jnp.asarray(a0, f32), jnp.asarray(b0, f32),
                       jnp.asarray(da, f32), jnp.asarray(db, f32)]),
            jnp.zeros((3,), f32)])
        azb = _warp_pallas(az_img, M, SB, LB, round_half=True,
                           mask_oob=False)
    bstart_f = decode_bstart(azb).astype(f32)

    # per-slice resample coefficients (k*l + c forms)
    gamma = abg[:, 2]
    kx = gamma * (da / LB)
    cx = gamma * (a0 + 0.5 * da / LB) - abg[:, 0]
    ky = gamma * (db / SB)
    cy = gamma * (b0 + 0.5 * db / SB) - abg[:, 1]
    coef = jnp.stack([kx, cx, ky, cy] + [jnp.zeros_like(kx)] * 4,
                     axis=1).astype(f32)

    # full-width band build streams the volume ONCE instead of LB/LBT
    # times (the build is DMA-bound; same r5 lever as sweep_pallas).
    # The resident (BAND, SB, LBT) bf16 band pair is ~43 MB at the
    # reference point — fits the raised scoped-VMEM limit.
    band_mb = 2 * BAND * SB * LB * 2 / 1e6
    if band_mb <= 60.0:
        lbt = LB
    else:
        lbt = LB if LB <= 384 else 256
        while LB % lbt != 0:
            lbt //= 2
    band_t, band_w = _band_call(vols[0], vols[1], bstart_f, coef,
                                SB=SB, LB=LB, LBT=lbt,
                                interpret=interpret)

    Hp = -(-h // TH) * TH
    Wp = -(-w // TW) * TW
    ntiles = (Hp // TH) * (Wp // TW)
    axt = _tile_order(ax.astype(f32), h, w, Hp, Wp, 0.0)[None]
    ayt = _tile_order(ay.astype(f32), h, w, Hp, Wp, 0.0)[None]
    azt = _tile_order(az.astype(f32), h, w, Hp, Wp, 1e6)[None]
    packv = jnp.stack([
        pack.abg0[0], pack.dabg[0], pack.abg0[1], pack.dabg[1],
        pack.abg0[2], pack.dabg[2], a0, b0, da, db,
        jnp.zeros_like(a0), jnp.zeros_like(a0), jnp.zeros_like(a0),
        jnp.zeros_like(a0), jnp.zeros_like(a0), jnp.zeros_like(a0),
    ])[None].astype(f32)

    ct, cw = _extract_call(band_t, band_w, bstart_f, packv, axt, ayt,
                           azt, SB=SB, LB=LB, ntiles=ntiles, Z=Z,
                           interpret=interpret)
    cache = jnp.stack([_untile(ct, h, w, Hp, Wp),
                       _untile(cw, h, w, Hp, Wp)])
    return cache, anchor
