"""Pallas TSDF fusion kernel: per-z-slice two-pass homography warp.

TPU-native re-design of ``kernel_updateTSDF`` (``src/core/cuda/TSDF.cu:
327-427``). The CUDA kernel does one random-access depth lookup per voxel;
on TPU random gather is ~0.1 G elem/s (XLA scalar loop), so instead we
exploit the structure of the projection: for a fixed volume z-slice, voxel
(x, y) -> pixel (u, w) is a homography H_z. The per-slice depth/assoc
lookup then factors into two axis-aligned dynamic gathers (the only fast
gather the VPU supports — ``tpu.dynamic_gather`` with per-lane indices):

  pass 1 (lanes = volume axis P, rows = image row h):
      A[h, p] = depth[h, round(U*(h, p))]
      with U*(h, p) = u(Q*(h, p), p) and Q*(h, p) the closed-form solution
      of w(q, p) = h  (index-corrected Catmull-Smith two-pass warp);
  pass 2 (lanes = P, rows = volume axis Q):
      depth_val[q, p] = A[round(w(q, p)), p].

Because pass 1 samples u along the exact w == h line rather than at the
voxel's own w, its column index can differ from round(u(q, p)) by
±0.5·|du/dq|/|dw/dq|. Pass 1 therefore gathers THREE column taps
(cu-1, cu, cu+1) and pass 2 recomputes pass 1's column closed-form and
selects the tap with delta = round(u) - cu(h=rh), recovering the exact
nearest-neighbor lookup depth[round(w), round(u)] whenever |delta| <= 1
(always, unless the shear |du/dq| exceeds 2|dw/dq|; validated against the
jnp reference in tests/test_fusion_pallas.py).

The solve axis Q is chosen per slice: (Q, P) = (y, x) normally, (x, y)
when |∂w/∂y| < |∂w/∂x| at the slice center (e.g. 90°-rolled camera) —
the result grid is then transposed before writing. This keeps pass 1
well-conditioned for every camera orientation; the residual degenerate
set (image rows parallel to BOTH volume axes of the slice) collapses the
slice to ~one pixel row and is clamped.

The fusion math (SDF truncation, association-weighted running average,
carve/reset rules) matches ``ops/fusion.integrate_tsdf`` line for line.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_rows(table, idx):
    """out[k, l] = table[idx[k, l], l] — sublane dynamic gather."""
    return jnp.take_along_axis(table, idx, axis=0, mode="promise_in_bounds")


def _gather_lanes(table, idx):
    """out[k, l] = table[k, idx[k, l]] — lane dynamic gather."""
    return jnp.take_along_axis(table, idx, axis=1, mode="promise_in_bounds")


def _fusion_kernel(coef_ref, depth_ref, assoc_ref, tsdf_ref, w_ref,
                   tsdf_out, w_out, *, Y: int, X: int, H: int, W: int,
                   S: int, L: int):
    """One z-slice. coef: full (Z, 16) scalar-prefetch array in SMEM;
    depth/assoc (S, L) VMEM (padded images); tsdf/w (1, Y, X) VMEM
    aliased in/out.

    The coef row already has the camera-from-(P,Q)-voxel affine selected
    for the chosen solve order; slot 15 = swap flag (0: P=x, 1: P=y).
    """
    g = pl.program_id(0)
    # cam = (ap, bp, gp)·p + (aq, bq, gq)·q + (c0, c1, c2)
    ap = coef_ref[g, 0]; aq = coef_ref[g, 1]; c0 = coef_ref[g, 2]
    bp = coef_ref[g, 3]; bq = coef_ref[g, 4]; c1 = coef_ref[g, 5]
    gp = coef_ref[g, 6]; gq = coef_ref[g, 7]; c2 = coef_ref[g, 8]
    fx = coef_ref[g, 9]; fy = coef_ref[g, 10]
    cx = coef_ref[g, 11]; cy = coef_ref[g, 12]
    truncdist = coef_ref[g, 13]
    max_weight = coef_ref[g, 14]
    swap = coef_ref[g, 15]

    f32 = jnp.float32

    # homography rows in (p, q): numerators for u, w; denominator = cam_z
    nu_p = fx * ap + cx * gp; nu_q = fx * aq + cx * gq
    nu_c = fx * c0 + cx * c2
    nw_p = fy * bp + cy * gp; nw_q = fy * bq + cy * gq
    nw_c = fy * c1 + cy * c2

    def pass1_col(h_i, p_i):
        """Closed-form pass-1 column index cu(h, p) (float, rounded)."""
        den1 = nw_q - h_i * gq
        den1 = jnp.where(jnp.abs(den1) < 1e-20,
                         jnp.where(den1 < 0, -1e-20, 1e-20), den1)
        qstar = (h_i * (gp * p_i + c2) - (nw_p * p_i + nw_c)) / den1
        camz1 = gp * p_i + gq * qstar + c2
        camz1 = jnp.where(jnp.abs(camz1) < 1e-20, 1e-20, camz1)
        ustar = (nu_p * p_i + nu_q * qstar + nu_c) / camz1
        return jnp.floor(ustar + 0.5)

    # ---- pass 1: build A taps on the padded (S, L) grid ----
    h_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0).astype(f32)        # image row
    p_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1).astype(f32)        # volume P lane
    cu_f = pass1_col(h_i, p_i)
    cu = jnp.clip(cu_f, 0, W - 1).astype(jnp.int32)
    cu_m = jnp.clip(cu_f - 1, 0, W - 1).astype(jnp.int32)
    cu_p = jnp.clip(cu_f + 1, 0, W - 1).astype(jnp.int32)
    A_m = _gather_lanes(depth_ref[:], cu_m)
    A = _gather_lanes(depth_ref[:], cu)
    A_p = _gather_lanes(depth_ref[:], cu_p)
    A2_m = _gather_lanes(assoc_ref[:], cu_m)
    A2 = _gather_lanes(assoc_ref[:], cu)
    A2_p = _gather_lanes(assoc_ref[:], cu_p)

    # ---- pass 2: per-voxel projection on the (S, L) grid ----
    qv = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0).astype(f32)         # volume Q
    pv = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1).astype(f32)         # volume P
    camx = ap * pv + aq * qv + c0
    camy = bp * pv + bq * qv + c1
    camz = gp * pv + gq * qv + c2
    in_front = camz > 0.0
    zsafe = jnp.where(in_front, camz, 1.0)
    u = camx * fx / zsafe + cx
    w = camy * fy / zsafe + cy
    pix_x = jnp.floor(u + 0.5).astype(jnp.int32)
    pix_y = jnp.floor(w + 0.5).astype(jnp.int32)
    in_frame = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)

    rh = jnp.clip(pix_y, 0, S - 1)
    # exact tap selection: recompute pass 1's column at row rh closed-form
    cu1_rh = pass1_col(rh.astype(f32), pv)
    delta = jnp.clip(pix_x.astype(f32) - cu1_rh, -1, 1).astype(jnp.int32)
    d_m = _gather_rows(A_m, rh)
    d_0 = _gather_rows(A, rh)
    d_p = _gather_rows(A_p, rh)
    depth_val = jnp.where(delta == -1, d_m,
                          jnp.where(delta == 1, d_p, d_0))
    a_m = _gather_rows(A2_m, rh)
    a_0 = _gather_rows(A2, rh)
    a_p = _gather_rows(A2_p, rh)
    assoc_val = jnp.where(delta == -1, a_m,
                          jnp.where(delta == 1, a_p, a_0))

    valid = in_front & in_frame & (depth_val > 0.0)

    ux = (pix_x.astype(f32) - cx) / fx
    uy = (pix_y.astype(f32) - cy) / fy
    lam = jnp.sqrt(ux * ux + uy * uy + 1.0)
    norm_cam = jnp.sqrt(camx * camx + camy * camy + camz * camz)
    sdf = depth_val - norm_cam / lam

    in_band = valid & (sdf >= -truncdist)
    tsdf_meas = jnp.sign(sdf) * jnp.minimum(1.0, jnp.abs(sdf) / truncdist)
    new_w = jnp.where(sdf < truncdist, assoc_val, 1.0)

    is_swapped = swap > 0.5

    def load_slice(ref):
        sl = ref[0]                       # (Y, X)
        padded = jnp.pad(sl, ((0, S - Y), (0, L - X)))
        padded_t = jnp.pad(sl.T, ((0, S - X), (0, L - Y)))
        return jnp.where(is_swapped, padded_t, padded)

    tsdf_p = load_slice(tsdf_ref)
    w_p = load_slice(w_ref)

    denom = w_p + new_w
    do_update = in_band & (denom > 0.0)
    fused = (w_p * tsdf_p + new_w * tsdf_meas) / jnp.where(
        do_update, denom, 1.0)
    t_res = jnp.where(do_update, fused, tsdf_p)
    w_res = jnp.where(do_update, jnp.minimum(denom, max_weight), w_p)

    carve = valid & (sdf < -truncdist) & (w_p == 0.0)
    t_res = jnp.where(carve, -1.0, t_res)

    reset = (w_p == 0.0) & in_frame & in_front & (depth_val <= 0.0)
    reset |= (w_p == 0.0) & ~in_front
    t_res = jnp.where(reset, 0.0, t_res)

    # write back in (y, x) order
    tsdf_out[0] = jnp.where(is_swapped, t_res[:X, :Y].T, t_res[:Y, :X])
    w_out[0] = jnp.where(is_swapped, w_res[:X, :Y].T, w_res[:Y, :X])


def _slice_coefs(rel_rot, rel_trans, intr, voxel_size, truncdist,
                 max_weight, Z: int, Y: int, X: int) -> jnp.ndarray:
    """(Z, 16) per-slice affine coefficients (f32), solve order selected
    per slice."""
    s = voxel_size
    oz = (Z - 1) / 2.0
    oy = (Y - 1) / 2.0
    ox = (X - 1) / 2.0
    R = rel_rot
    t = rel_trans
    fy = intr[1, 1]
    cy = intr[1, 2]
    z = jnp.arange(Z, dtype=jnp.float32)
    zz = (z - oz) * s
    # cam = R @ ((x-ox)s, (y-oy)s, zz) + t ; per-axis coefficients
    ax = R[0, 0] * s; ay = R[0, 1] * s
    bx = R[1, 0] * s; by = R[1, 1] * s
    gx = R[2, 0] * s; gy = R[2, 1] * s
    c0 = R[0, 2] * zz + t[0] - s * (R[0, 0] * ox + R[0, 1] * oy)
    c1 = R[1, 2] * zz + t[1] - s * (R[1, 0] * ox + R[1, 1] * oy)
    c2 = R[2, 2] * zz + t[2] - s * (R[2, 0] * ox + R[2, 1] * oy)

    # conditioning of the q-solve: pass-1 denominator at the image center
    # row h ~= cy is nw_q - cy*g_q = fy*b_q, i.e. proportional to |R1q|.
    swap = (jnp.abs(bx) > jnp.abs(by)).astype(jnp.float32)
    swap = jnp.broadcast_to(swap, z.shape)

    def pick(a_p, a_q):
        """lane coefficient, row coefficient under the swap flag."""
        return (jnp.where(swap > 0, a_q, a_p),
                jnp.where(swap > 0, a_p, a_q))

    ap, aq = pick(jnp.broadcast_to(ax, z.shape),
                  jnp.broadcast_to(ay, z.shape))
    bp, bq = pick(jnp.broadcast_to(bx, z.shape),
                  jnp.broadcast_to(by, z.shape))
    gp, gq = pick(jnp.broadcast_to(gx, z.shape),
                  jnp.broadcast_to(gy, z.shape))

    full = functools.partial(jnp.full, (Z,))
    return jnp.stack([
        ap, aq, c0, bp, bq, c1, gp, gq, c2,
        full(intr[0, 0]), full(fy), full(intr[0, 2]), full(cy),
        full(truncdist), full(max_weight), swap,
    ], axis=1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _integrate_impl(tsdf, weights, depth, assoc, coefs, interpret=False):
    Z, Y, X = tsdf.shape
    H, W = depth.shape
    # the working grid must fit both solve orders and the image
    S = _round_up(max(Y, X, H), 8)
    L = _round_up(max(X, Y, W), 128)
    depth_p = jnp.pad(depth, ((0, S - H), (0, L - W)))
    assoc_p = jnp.pad(assoc, ((0, S - H), (0, L - W)))

    kern = functools.partial(_fusion_kernel, Y=Y, X=X, H=H, W=W, S=S, L=L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Z,),
        in_specs=[
            pl.BlockSpec((S, L), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, X), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, X), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Y, X), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, X), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_t, out_w = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
        ),
        # inputs are (coefs, depth, assoc, tsdf, weights): alias volumes
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(coefs, depth_p, assoc_p, tsdf, weights)
    return out_t, out_w


def integrate_tsdf_pallas(tsdf, weights, depth, assoc_weights, rel_rot_oc,
                          rel_trans_oc, intr, voxel_size, truncdist,
                          max_weight, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`ops.fusion.integrate_tsdf`."""
    tsdf = jnp.asarray(tsdf, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    Z, Y, X = tsdf.shape
    coefs = _slice_coefs(jnp.asarray(rel_rot_oc), jnp.asarray(rel_trans_oc),
                         jnp.asarray(intr), voxel_size, truncdist,
                         max_weight, Z, Y, X)
    return _integrate_impl(tsdf, weights, jnp.asarray(depth, jnp.float32),
                           jnp.asarray(assoc_weights, jnp.float32),
                           coefs, interpret=interpret)
