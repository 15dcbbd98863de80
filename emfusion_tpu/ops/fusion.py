"""Projective TSDF fusion + gradient volumes + fg/bg evidence counting.

TPU-native equivalents of ``kernel_updateTSDF`` (``src/core/cuda/TSDF.cu:
327-427``), ``kernel_computeTSDFGrads`` (``TSDF.cu:429-464``) and
``kernel_updateFgBgProbs`` (``src/core/cuda/ObjTSDF.cu:29-107``).

All three are voxel-parallel maps with a single gather from image space —
ideal XLA programs: the coordinate streams are fused iotas, the only memory
traffic is the volume read/write (HBM-bandwidth-bound) plus one image gather.
A Pallas fused variant lives in ``ops/pallas/``; these jnp versions are the
reference semantics and the fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _voxel_cam_coords(res_zyx, voxel_size, rel_rot, rel_trans):
    """Camera-space position of every voxel center: (Z, Y, X, 3).

    Voxel centers follow the reference convention
    ``pos = (idx - (res-1)/2) * voxel_size`` (``TSDF.cu:345-349``).
    XLA fuses the iotas; nothing here materializes except the result of the
    consuming expression.
    """
    Z, Y, X = res_zyx
    zi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 0)
    yi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 1)
    xi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 2)
    px = (xi - (X - 1) / 2.0) * voxel_size
    py = (yi - (Y - 1) / 2.0) * voxel_size
    pz = (zi - (Z - 1) / 2.0) * voxel_size
    cx = rel_rot[0, 0] * px + rel_rot[0, 1] * py + rel_rot[0, 2] * pz + rel_trans[0]
    cy = rel_rot[1, 0] * px + rel_rot[1, 1] * py + rel_rot[1, 2] * pz + rel_trans[1]
    cz = rel_rot[2, 0] * px + rel_rot[2, 1] * py + rel_rot[2, 2] * pz + rel_trans[2]
    return cx, cy, cz


def _project_gather(img: jnp.ndarray, pix_x: jnp.ndarray, pix_y: jnp.ndarray,
                    in_frame: jnp.ndarray) -> jnp.ndarray:
    """Gather img[(py, px)] with clamped indices; caller masks validity."""
    H, W = img.shape
    pxc = jnp.clip(pix_x, 0, W - 1)
    pyc = jnp.clip(pix_y, 0, H - 1)
    flat = pyc * W + pxc
    return jnp.take(img.reshape(-1), flat)


def integrate_tsdf(tsdf: jnp.ndarray, weights: jnp.ndarray,
                   depth: jnp.ndarray, assoc_weights: jnp.ndarray,
                   rel_rot_oc: jnp.ndarray, rel_trans_oc: jnp.ndarray,
                   intr: jnp.ndarray, voxel_size, truncdist,
                   max_weight: float, carve_dist=None,
                   carve_weight_cap=None, carve_margin=None):
    """Weighted projective TSDF fusion with association weights.

    Faithful to ``kernel_updateTSDF`` semantics including the carving rules:
      * voxel behind the camera or projecting to invalid depth, with weight
        0: tsdf reset to 0 (raycast-artifact avoidance, ``TSDF.cu:351-372``);
      * sdf < -truncdist (occluded beyond trunc band) with weight 0:
        tsdf set to -1 (``TSDF.cu:398-400``);
      * within band: running weighted average with the per-pixel association
        weight as integration weight (weight 1.0 in free space beyond
        +truncdist), capped at ``max_weight`` (``TSDF.cu:382-397``).

    ``carve_dist`` (default ``truncdist`` = exact reference semantics):
    free-space measurements ``sdf >= carve_dist`` integrate at full
    weight 1.0 instead of the association weight. The reference applies
    weight 1 only beyond ``+truncdist``, so a surface burned into the
    BACKGROUND before an object was spawned (frame-0 association is 1
    everywhere, ``EMFusion.cpp:55``) erodes only at the object pixels'
    near-zero bg association weight once the object moves away — the
    stale imprint stays raycastable, the >5 cm bg override then blanks
    the object's segmentation, and the visibility check deletes a
    perfectly tracked object. Setting ``carve_dist`` to the override
    distance (``Params.bg_carve_dist``) lets contradicted free space
    decay at the same rate the compositor starts trusting it.

    ``carve_weight_cap``: on carve votes (``sdf >= carve_dist``) the
    STORED weight entering the running average is clamped to this value
    (None = no clamp). Without it a surface integrated for k frames
    carries weight ~k and free-space evidence at weight 1/frame takes
    ~k more frames to flip the sign — the stale crossing outruns the
    carving for exactly as long as the object was static before moving
    (measured: the 512^3 bench object still dies at frame 10 with
    carve_dist alone). A voxel on an unoccluded ray in front of the
    measured surface is empty NOW; capping the stale weight (not
    resetting — depth noise still averages over ~cap+1 frames) lets
    truth win in O(cap) frames. Static free space is unaffected in
    value (measurements there already agree).

    ``carve_margin`` (r5, ADVICE r4): gate the weight cap on ACTUAL
    contradiction — the cap applies only where the free-space
    measurement exceeds the stored tsdf by more than this margin (in
    tsdf units). In the agreeing shell ``carve_dist <= sdf <
    truncdist`` in front of ordinary background surfaces, stored and
    measured values agree, so the running average (and its noise
    suppression) is preserved; genuinely contradicted voxels (a stale
    surface the camera now sees through) still flip immediately.
    None = cap applies to every carve vote (the r4 behavior).

    Returns (tsdf, weights) updated.
    """
    if carve_dist is None:
        carve_dist = truncdist
    Z, Y, X = tsdf.shape
    H, W = depth.shape
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]

    ccx, ccy, ccz = _voxel_cam_coords((Z, Y, X), voxel_size, rel_rot_oc,
                                      rel_trans_oc)

    in_front = ccz > 0.0
    zsafe = jnp.where(in_front, ccz, 1.0)
    pix_x = jnp.round(ccx * fx / zsafe + cx).astype(jnp.int32)
    pix_y = jnp.round(ccy * fy / zsafe + cy).astype(jnp.int32)
    in_frame = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)

    depth_val = _project_gather(depth, pix_x, pix_y, in_frame)
    assoc_val = _project_gather(assoc_weights, pix_x, pix_y, in_frame)

    valid = in_front & in_frame & (depth_val > 0.0)

    # sdf = depth - |pos_cam| / lambda, lambda = |unproject(pix, 1)|
    ux = (pix_x.astype(jnp.float32) - cx) / fx
    uy = (pix_y.astype(jnp.float32) - cy) / fy
    lam = jnp.sqrt(ux * ux + uy * uy + 1.0)
    norm_cam = jnp.sqrt(ccx * ccx + ccy * ccy + ccz * ccz)
    sdf = depth_val - norm_cam / lam

    in_band = valid & (sdf >= -truncdist)
    tsdf_meas = jnp.sign(sdf) * jnp.minimum(1.0, jnp.abs(sdf) / truncdist)
    carving = valid & (sdf >= carve_dist)
    new_w = jnp.where(carving, 1.0, assoc_val)
    w_eff = weights
    if carve_weight_cap is not None:
        capped = carving
        if carve_margin is not None:
            capped = carving & (tsdf_meas - tsdf > carve_margin)
        w_eff = jnp.where(capped,
                          jnp.minimum(weights, carve_weight_cap),
                          weights)

    denom = w_eff + new_w
    do_update = in_band & (denom > 0.0)
    fused = (w_eff * tsdf + new_w * tsdf_meas) / jnp.where(do_update, denom,
                                                           1.0)
    tsdf_out = jnp.where(do_update, fused, tsdf)
    weights_out = jnp.where(do_update, jnp.minimum(denom, max_weight), weights)

    # Carve: behind trunc band and never-seen voxel -> -1
    carve = valid & (sdf < -truncdist) & (weights == 0.0)
    tsdf_out = jnp.where(carve, -1.0, tsdf_out)

    # Reset unseen voxels that project invalid (behind camera / no depth /
    # off-frame keeps previous value except the two weight==0 reset rules).
    reset = (weights == 0.0) & in_frame & in_front & (depth_val <= 0.0)
    reset |= (weights == 0.0) & ~in_front
    tsdf_out = jnp.where(reset, 0.0, tsdf_out)

    return tsdf_out, weights_out


def compute_gradients(tsdf: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference gradient volume, channel-first (3, Z, Y, X) with
    channels (gx, gy, gz) in voxel units; last slice along each axis is
    zero (``kernel_computeTSDFGrads``, ``TSDF.cu:429-464``). A trailing
    channel axis would be lane-padded 3 -> 128 on TPU."""
    Z, Y, X = tsdf.shape
    # shift-and-subtract via roll keeps this one fused elementwise pass on
    # TPU (dynamic-update-slice writes cost several extra volume copies)
    gx = jnp.roll(tsdf, -1, axis=2) - tsdf
    gy = jnp.roll(tsdf, -1, axis=1) - tsdf
    gz = jnp.roll(tsdf, -1, axis=0) - tsdf
    # reference zeroes the full boundary slab (kernel guard is on any axis);
    # this also kills the roll wrap-around values
    zi = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 2)
    mask = (zi < Z - 1) & (yi < Y - 1) & (xi < X - 1)
    g = jnp.stack([gx, gy, gz], axis=0)
    return jnp.where(mask[None], g, 0.0)


def integrate_fg_mask(tsdf: jnp.ndarray, weights: jnp.ndarray,
                      fg_counts: jnp.ndarray, mask: jnp.ndarray,
                      occluded_mask: jnp.ndarray, rel_rot_oc: jnp.ndarray,
                      rel_trans_oc: jnp.ndarray, intr: jnp.ndarray,
                      voxel_size) -> jnp.ndarray:
    """Per-voxel fg/bg evidence counting from a segmentation mask.

    Matches ``kernel_updateFgBgProbs`` (``ObjTSDF.cu:29-107``): only voxels
    with ``|tsdf| < 1`` and weight > 0 projecting to a non-occluded pixel in
    frame accumulate ``fg += mask``, ``bg += 1 - mask``.
    ``fg_counts`` is channel-first (2, Z, Y, X).
    """
    Z, Y, X = tsdf.shape
    H, W = mask.shape
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]

    ccx, ccy, ccz = _voxel_cam_coords((Z, Y, X), voxel_size, rel_rot_oc,
                                      rel_trans_oc)
    in_front = ccz > 0.0
    zsafe = jnp.where(in_front, ccz, 1.0)
    pix_x = jnp.round(ccx * fx / zsafe + cx).astype(jnp.int32)
    pix_y = jnp.round(ccy * fy / zsafe + cy).astype(jnp.int32)
    in_frame = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)

    m = _project_gather(mask.astype(jnp.float32), pix_x, pix_y, in_frame)
    occ = _project_gather(occluded_mask.astype(jnp.float32), pix_x, pix_y,
                          in_frame)

    update = (jnp.abs(tsdf) < 1.0) & (weights > 0.0) & in_front & in_frame \
        & (occ == 0.0)
    fg = fg_counts[0] + jnp.where(update, m, 0.0)
    bg = fg_counts[1] + jnp.where(update, 1.0 - m, 0.0)
    return jnp.stack([fg, bg], axis=0)
