"""Banded sweep-capture: LM tracking caches with ZERO per-point HBM
gathers.

TPU redesign of the tracking capture stage. The per-point 6^3
neighborhood gather (``geometry/capture.py``) costs ~140-200 ms per
capture at 512^3/N=34k through XLA:TPU's scalar gather loop — the
dominant cost of the whole SLAM frame (NOTES_R3.md). This module
replaces the HBM gather with the homography-pencil ("B-space")
structure used by fusion and raycast:

  1. **Band sweep** (one streaming pass over the volume, MXU work):
     every B-grid column is a camera ray of the tracking-pixel grid;
     sweeping the volume z-slices, each slice is resampled at the
     columns' ray crossings (two separable 2-tap linear matmuls) and
     the ``BAND`` consecutive slices around each column's depth anchor
     are deposited into a per-column z-band:
     ``band[c, d, s, l] = R_{bstart[s,l]+d}[s, l]`` (R_z = slice z
     resampled in-plane; ``bstart = floor(vz of the column's pixel) -
     OFF_Z - BSTART``). Unwritten entries keep a sentinel.
  2. **Extraction**: each tracking point's capture cache —
     ``cache[c, dz, dy, dx, n]`` at VOXEL-ALIGNED offsets, exactly the
     layout of ``geometry.capture`` — is read out of the band: the tap
     at volume position (vx+dx-2, vy+dy-2, az+dz) on slice z' = az+dz
     lies at B-coords ((vx+dx-2+alpha(z'))/gamma(z'), ...), an
     in-plane BILINEAR interpolation of the band's B-lattice at slot
     z'-bstart. All index arithmetic runs over the small (SB, LB)
     B-grid; nothing touches HBM per point.
  3. The LM loop then uses the UNCHANGED ``geometry.capture`` tent
     samplers and drift check — the band cache is a drop-in value
     source (its entries are in-plane-resampled field values instead
     of raw voxel reads).

A point whose 6^3 window cannot be served (a tap's band slot out of
range — depth discontinuity beyond the BAND slack — or in-plane
position outside the B-grid) has its ENTIRE cache zeroed: the tent
samplers then yield psi=0/gradient 0 and the point contributes nothing
until the next re-capture, like an out-of-volume point. The reference
keeps such pixels (it gathers fresh); this and the in-plane resample
smoothing are the documented deviations, bounded by the tracking
accuracy gates.

Reference for what this replaces: ``kernel_getVolumeVals`` /
``kernel_computePoseGradients`` (``src/core/cuda/TSDF.cu:603-726``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from emfusion_tpu.geometry.capture import WIN, _ANCHOR_OFF
from emfusion_tpu.geometry.sampling import _transform_to_grid
from emfusion_tpu.ops.fusion_pencil import (
    _pencil_setup, _window_from_quad,
)
from emfusion_tpu.ops.raycast_sweep import _linear_matrix

BAND = 20        # band depth per column: WIN z-slices + -BSTART/+7
                 # slack for the point-vs-column anchor disagreement.
                 # A surface tilted against the scan axis by angle
                 # theta shifts anchors by tan(theta) voxels per
                 # in-plane voxel; the multi-axis capture (see
                 # band_capture_multi) guarantees some axis has
                 # tan(theta) <= sqrt(2), i.e. <= ~5.7 voxels over the
                 # +-4-voxel tap radius — inside this slack.
BSTART = 7       # band starts BSTART slices below the column anchor
_BIG = 1e30
_BIG_HALF = 1e29
AZ_BIAS = 4096.0   # encodes "valid anchor" in the warped azb image


class BandPack(NamedTuple):
    """Pencil constants of a capture (define the B lattice)."""
    abg0: jnp.ndarray    # (3,) alpha/beta/gamma at z-index 0
    dabg: jnp.ndarray    # (3,) d(alpha,beta,gamma)/dz
    win: jnp.ndarray     # (4,) a0, b0, da, db


def grid_dims_for(h: int, w: int, oversample: float = 1.25):
    """Band B-grid dims for an (h, w) tracking grid."""
    SB = int(-(-int(h * oversample) // 8) * 8)
    LB = int(-(-int(w * oversample) // 128) * 128)
    return SB, LB


def pencil_at_pose(rel_rot_co, rel_trans_co, intr, voxel_size,
                   shape, h, w):
    """Pencil homography for the capture pose (rel = camera->volume,
    the tracking convention); returns (Bmat, abg (Z,3))."""
    Z, Y, X = shape
    R_oc = rel_rot_co.T
    t_oc = -R_oc @ rel_trans_co
    Bmat, Binv, abg, capx, capy, camc = _pencil_setup(
        R_oc, t_oc, intr, voxel_size, Z, Y, X)
    return Bmat, abg


def pack_from_points(abg, vx, vy, vz, pz):
    """B-window sized from the tracking POINTS (not the image quad):
    for perpendicular scan axes the camera plane crosses the volume
    (gamma changes sign inside it) and the quad's B-footprint spans
    infinity — but the band only ever needs the columns of the points
    plus their tap extents. Points too close to the camera's slice
    plane (|gamma| below 5% of the volume's max) cannot be served by
    this axis (their ray grazes its slices) and are excluded from the
    window; their taps then fall outside it and drop naturally."""
    abg0 = abg[0]
    dabg = abg[1] - abg[0]
    gamma = abg0[2] + vz * dabg[2]
    gmax = jnp.max(jnp.abs(abg[:, 2]))
    ok = (pz > 0) & (jnp.abs(gamma) > 0.05 * gmax)
    gsafe = jnp.where(jnp.abs(gamma) < 1e-12,
                      jnp.where(gamma < 0, -1e-12, 1e-12), gamma)
    a = (vx + (abg0[0] + vz * dabg[0])) / gsafe
    b = (vy + (abg0[1] + vz * dabg[1])) / gsafe
    big = jnp.float32(1e30)
    amin = jnp.min(jnp.where(ok, a, big))
    amax = jnp.max(jnp.where(ok, a, -big))
    bmin = jnp.min(jnp.where(ok, b, big))
    bmax = jnp.max(jnp.where(ok, b, -big))
    # tap extent: up to WIN+2 voxels beyond a point, in a/b units
    marg = (WIN + 2.0) * jnp.max(jnp.where(ok, 1.0 / jnp.abs(gsafe),
                                           0.0))
    a0 = amin - marg
    b0 = bmin - marg
    da = jnp.maximum(amax - amin + 2.0 * marg, 1e-6)
    db = jnp.maximum(bmax - bmin + 2.0 * marg, 1e-6)
    return BandPack(
        abg0=abg0, dabg=dabg,
        win=jnp.stack([a0, b0, da, db]).astype(jnp.float32))


def decode_bstart(azb_warped: jnp.ndarray) -> jnp.ndarray:
    """Warped (+AZ_BIAS-encoded) column anchors -> int32 band start
    slices; columns without an anchor (invalid/out-of-image pixels,
    decoded 0) get a start far outside any slice range, so their band
    entries stay sentinel."""
    valid = azb_warped > AZ_BIAS / 2
    bs = azb_warped - AZ_BIAS - _ANCHOR_OFF - BSTART
    return jnp.where(valid, bs, 1e6).astype(jnp.int32)


def column_anchor_image(points_cam, rel_rot, rel_trans, voxel_size,
                        shape, h: int, w: int):
    """(h, w) AZ_BIAS-encoded floor(vz) image for the azb warp."""
    vx, vy, vz, pz = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                        voxel_size, shape)
    return jnp.where(pz > 0, jnp.floor(vz) + AZ_BIAS, 0.0
                     ).reshape(h, w).astype(jnp.float32)


def warp_anchor_clamped(az_img, Bmat, pack: BandPack, SB: int, LB: int):
    """Warp the per-pixel anchor image to the B grid with CLAMPED
    nearest-pixel lookup: columns outside the image quad (the expanded
    window's margin, serving taps just past the frustum edge) take the
    edge pixel's anchor instead of being dropped."""
    f32 = jnp.float32
    h, w = az_img.shape
    a0, b0, da, db = pack.win[0], pack.win[1], pack.win[2], pack.win[3]
    a = (jnp.arange(LB, dtype=f32) + 0.5) / LB * da + a0
    b = (jnp.arange(SB, dtype=f32) + 0.5) / SB * db + b0
    hom = (Bmat[:, 0][:, None, None] * a[None, None, :]
           + Bmat[:, 1][:, None, None] * b[None, :, None]
           + Bmat[:, 2][:, None, None])                  # (3, SB, LB)
    wz = jnp.where(jnp.abs(hom[2]) < 1e-12, 1e-12, hom[2])
    u = jnp.clip(jnp.floor(hom[0] / wz + 0.5), 0, w - 1)
    v = jnp.clip(jnp.floor(hom[1] / wz + 0.5), 0, h - 1)
    flat = (v * w + u).astype(jnp.int32)
    return jnp.take(az_img.reshape(-1), flat.reshape(-1)
                    ).reshape(SB, LB)


# ----------------------------------------------------------------------
# XLA reference implementation (CPU path + parity oracle for the
# Pallas kernels in ops/pallas/band_pallas.py)
# ----------------------------------------------------------------------

def build_band_xla(vols, bstart, abg, pack: BandPack, SB: int, LB: int):
    """(C, BAND, SB, LB) band via a lax.scan over slices; unwritten
    entries hold the _BIG sentinel."""
    C, Z, Y, X = vols.shape
    f32 = jnp.float32
    a0, b0, da, db = (pack.win[0], pack.win[1], pack.win[2],
                      pack.win[3])
    a_vec = (jnp.arange(LB, dtype=f32) + 0.5) / LB * da + a0
    b_vec = (jnp.arange(SB, dtype=f32) + 0.5) / SB * db + b0

    def body(band, xs):
        slices, coef, z = xs
        alpha, beta, gamma = coef[0], coef[1], coef[2]
        p_of_a = a_vec * gamma - alpha          # (LB,)
        q_of_b = b_vec * gamma - beta           # (SB,)
        Ecol = _linear_matrix(X, p_of_a)        # (X, LB)
        Erow = _linear_matrix(Y, q_of_b)        # (Y, SB)
        R_z = jnp.einsum("ys,cyx,xl->csl", Erow, slices.astype(f32),
                         Ecol)                  # (C, SB, LB)
        ok = ((p_of_a >= 0.0) & (p_of_a <= X - 1.0))[None, :] \
            & ((q_of_b >= 0.0) & (q_of_b <= Y - 1.0))[:, None]
        d = z - bstart                          # (SB, LB)
        for dd in range(BAND):
            take = (d == dd) & ok
            band = band.at[:, dd].set(
                jnp.where(take[None], R_z, band[:, dd]))
        return band, None

    init = jnp.full((C, BAND, SB, LB), _BIG, f32)
    band, _ = lax.scan(
        body, init,
        (jnp.moveaxis(vols, 1, 0), abg,
         jnp.arange(Z, dtype=jnp.int32)))
    return band


def extract_caches_xla(band, bstart, ax, ay, az, pack: BandPack,
                       SB: int, LB: int):
    """Capture caches from the band (gather formulation — the oracle
    for the Pallas extraction kernel).

    Returns (cache (C, WIN, WIN, WIN, N) f32, point_ok (N,) bool);
    ``cache`` is zeroed wholesale for points with any unserved tap.
    Tap (dz, dy, dx) of point n = band slot ``az+dz-bstart`` bilinearly
    interpolated over the B-lattice at the B-coords of the INTEGER
    lattice position (ax+dx, ay+dy, az+dz) — the exact voxel centers
    the direct capture reads (``geometry.capture``).
    """
    C = band.shape[0]
    N = ax.shape[0]
    f32 = jnp.float32
    d = jnp.arange(WIN, dtype=f32)
    a0, b0, da, db = (pack.win[0], pack.win[1], pack.win[2],
                      pack.win[3])

    # per (dz, n): slice z' and its alpha/beta/gamma
    zp = az.astype(f32)[None, :] + d[:, None]          # (W, N)
    alpha = pack.abg0[0] + zp * pack.dabg[0]
    beta = pack.abg0[1] + zp * pack.dabg[1]
    gamma = pack.abg0[2] + zp * pack.dabg[2]
    gsafe = jnp.where(jnp.abs(gamma) < 1e-12,
                      jnp.where(gamma < 0, -1e-12, 1e-12), gamma)

    # tap positions: x-taps depend on (dz, dx), y-taps on (dz, dy)
    px = (ax.astype(f32)[None, None, :] + d[None, :, None])  # (1,W,N)
    ga = ((px + alpha[:, None, :]) / gsafe[:, None, :] - a0) \
        / da * LB - 0.5                                  # (Wz, Wx, N)
    py = (ay.astype(f32)[None, None, :] + d[None, :, None])
    gb = ((py + beta[:, None, :]) / gsafe[:, None, :] - b0) \
        / db * SB - 0.5                                  # (Wz, Wy, N)

    la0 = jnp.floor(ga)
    fa = ga - la0
    lb0 = jnp.floor(gb)
    fb = gb - lb0
    ok_a = (ga >= 0.0) & (ga <= LB - 1.0)
    ok_b = (gb >= 0.0) & (gb <= SB - 1.0)
    la0 = jnp.clip(la0.astype(jnp.int32), 0, LB - 2)
    lb0 = jnp.clip(lb0.astype(jnp.int32), 0, SB - 2)

    # gather the 2x2 cell values at slot z'-bstart[cell], per tap
    zp_i = az[None, :] + jnp.arange(WIN, dtype=jnp.int32)[:, None]

    def cell(dy_off, dx_off):
        cs = lb0 + dy_off                                # (Wz, Wy, N)
        cl = la0 + dx_off                                # (Wz, Wx, N)
        colf = (cs[:, :, None, :] * LB + cl[:, None, :, :])  # Wz,Wy,Wx,N
        bst = jnp.take(bstart.reshape(-1), colf.reshape(-1)
                       ).reshape(colf.shape)
        slot = zp_i[:, None, None, :] - bst
        ok_s = (slot >= 0) & (slot < BAND)
        slot = jnp.clip(slot, 0, BAND - 1)
        flat = slot * (SB * LB) + colf
        vals = jnp.stack([
            jnp.take(band[c].reshape(-1), flat.reshape(-1)
                     ).reshape(flat.shape) for c in range(C)])
        good = ok_s & (vals[0] < _BIG_HALF)
        return jnp.where(good[None], vals, 0.0), good

    v00, g00 = cell(0, 0)
    v01, g01 = cell(0, 1)
    v10, g10 = cell(1, 0)
    v11, g11 = cell(1, 1)
    wa = fa[:, None, :, :]
    wb = fb[:, :, None, :]
    cache = ((v00 * (1 - wa) + v01 * wa) * (1 - wb)
             + (v10 * (1 - wa) + v11 * wa) * wb)
    ok_tap = (g00 & g01 & g10 & g11
              & ok_a[:, None, :, :] & ok_b[:, :, None, :])
    point_ok = jnp.all(ok_tap.reshape(-1, N), axis=0)
    cache = jnp.where(point_ok[None, None, None, None, :], cache, 0.0)
    return cache, point_ok


def band_capture_xla(vols, points_cam, rel_rot, rel_trans, voxel_size,
                     intr, h: int, w: int, SB: int, LB: int):
    """Full XLA band capture. ``points_cam``: (3, N), N = h*w (the
    tracking pixel grid in raster order); ``intr`` = intrinsics OF THAT
    GRID. Returns (cache (C, WIN, WIN, WIN, N), anchor (3, N) int32)
    compatible with ``geometry.capture``'s samplers/drift check."""
    C, Z, Y, X = vols.shape
    shape = (Z, Y, X)
    Bmat, abg = pencil_at_pose(rel_rot, rel_trans, intr,
                               voxel_size, shape, h, w)
    vx, vy, vz, pz = _transform_to_grid(points_cam, rel_rot, rel_trans,
                                        voxel_size, shape)
    pack = pack_from_points(abg, vx, vy, vz, pz)
    ax = jnp.floor(vx).astype(jnp.int32) - _ANCHOR_OFF
    ay = jnp.floor(vy).astype(jnp.int32) - _ANCHOR_OFF
    az = jnp.floor(vz).astype(jnp.int32) - _ANCHOR_OFF

    az_img = jnp.where(pz > 0, jnp.floor(vz) + AZ_BIAS, 0.0
                       ).reshape(h, w).astype(jnp.float32)
    azb = warp_anchor_clamped(az_img, Bmat, pack, SB, LB)
    bstart = decode_bstart(azb)

    band = build_band_xla(vols, bstart, abg, pack, SB, LB)
    cache, _ = extract_caches_xla(band, bstart, ax, ay, az, pack,
                                  SB, LB)
    return cache, jnp.stack([ax, ay, az])


# coordinate relabeling (ops.fusion_pencil.pick_scan_axis conventions)
from emfusion_tpu.ops.fusion_pencil import AXIS_COORD, AXIS_TRANSPOSE  # noqa: E402


def band_capture(vols, points_cam, rel_rot, rel_trans, voxel_size,
                 intr, h: int, w: int, SB: int, LB: int, axis: int = 2,
                 backend: str = "xla"):
    """Axis-aware band capture front end: relabels the volume so the
    sweep scans along ``axis`` (the camera-dominant volume axis, cf.
    ``pick_scan_axis``), runs the band build + extraction, and returns
    the cache/anchors back in ORIGINAL volume coordinates — a drop-in
    replacement for ``geometry.capture.capture_neighborhoods``."""
    if axis == 2:
        if backend == "pallas":
            from emfusion_tpu.ops.pallas.band_pallas import (
                band_capture_pallas)
            return band_capture_pallas(vols, points_cam, rel_rot,
                                       rel_trans, voxel_size, intr,
                                       h, w, SB, LB)
        return band_capture_xla(vols, points_cam, rel_rot, rel_trans,
                                voxel_size, intr, h, w, SB, LB)
    perm = AXIS_COORD[axis]
    tr = AXIS_TRANSPOSE[axis]
    vols_r = jnp.transpose(vols, (0,) + tuple(d + 1 for d in tr))
    permj = jnp.asarray(perm, jnp.int32)
    rel_rot_r = rel_rot[permj, :]
    rel_trans_r = rel_trans[permj]
    if backend == "pallas":
        from emfusion_tpu.ops.pallas.band_pallas import (
            band_capture_pallas)
        cache, anchor = band_capture_pallas(
            vols_r, points_cam, rel_rot_r, rel_trans_r, voxel_size,
            intr, h, w, SB, LB)
    else:
        cache, anchor = band_capture_xla(
            vols_r, points_cam, rel_rot_r, rel_trans_r, voxel_size,
            intr, h, w, SB, LB)
    # cache dims (c, dz', dy', dx', n) sit on relabeled coords
    # (z', y', x') = old coords (perm[2], perm[1], perm[0]); reorder to
    # the original (z, y, x) and anchors to (x, y, z) rows.
    rev = (perm[2], perm[1], perm[0])      # cache dim k+1 -> old coord
    dim_of = {coord: k + 1 for k, coord in enumerate(rev)}
    cache = jnp.transpose(
        cache, (0, dim_of[2], dim_of[1], dim_of[0], 4))
    row_of = {coord: k for k, coord in enumerate(perm)}
    anchor = jnp.stack([anchor[row_of[0]], anchor[row_of[1]],
                        anchor[row_of[2]]])
    return cache, anchor


def band_capture_multi(vols, points_cam, rel_rot, rel_trans,
                       voxel_size, intr, h: int, w: int, SB: int,
                       LB: int, axes=(2, 1, 0), backend: str = "xla"):
    """Normal-directed multi-axis band capture.

    A single-axis band cannot serve points on surfaces nearly PARALLEL
    to the scan axis: the serving column's ray grazes the surface, so
    its depth anchor sits many slices away from the point's z-window
    (measured: a floor at 2.5 m needs ~13 voxels of slack per pixel —
    unbounded as the surface approaches the horizon). Running the band
    along every volume axis bounds the problem: whichever axis is most
    aligned with the local surface normal sees anchor slopes
    <= sqrt(2) voxel/voxel, within the BAND slack. Each point takes
    the FIRST axis (in ``axes`` order — put the camera-dominant axis
    first) whose extraction fully served it; unserved-everywhere
    points (deep concavities/discontinuities) stay zeroed and drop out
    of the LM for this capture, as in the single-axis scheme."""
    cache = None
    anchor = None
    for ax in axes:
        c_a, anchor = band_capture(vols, points_cam, rel_rot,
                                   rel_trans, voxel_size, intr, h, w,
                                   SB, LB, axis=ax, backend=backend)
        if cache is None:
            cache = c_a
        else:
            served = jnp.any(
                jnp.abs(cache).reshape(-1, cache.shape[-1]) > 0,
                axis=0)
            cache = jnp.where(served[None, None, None, None, :],
                              cache, c_a)
    return cache, anchor
