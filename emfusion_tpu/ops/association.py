"""E-step: probabilistic data-association weights.

TPU-native equivalent of ``TSDF::computeAssociation``/``computeLaplace``
(``src/core/TSDF.cpp:125-156``), ``ObjTSDF::computeAssociation``
(``src/core/ObjTSDF.cpp:181-201``) and the per-pixel normalization in
``EMFusion::computeAssociationWeights`` (``src/core/EMFusion.cpp:635-670``).

Pure elementwise math over one trilinear sample per model — XLA fuses the
whole E-step for all models into a handful of gathers plus one fused
elementwise pass. Batched over the object pool with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emfusion_tpu.geometry.sampling import sample_volume_at_points


def compute_laplace(tsdf: jnp.ndarray, points_cam: jnp.ndarray,
                    rel_rot_co: jnp.ndarray, rel_trans_co: jnp.ndarray,
                    voxel_size, truncdist, assoc_sigma):
    """Laplace likelihood of the TSDF value sampled at each pixel's point.

    Returns (laplace, invalid_mask): ``laplace = exp(-truncdist*|psi|/sigma)
    / (2 sigma)`` and the reference's exact-zero sentinel mask
    (``TSDF.cpp:148-149``: sampled value == 0 marks out-of-volume/invalid).
    """
    psi = sample_volume_at_points(tsdf, points_cam, rel_rot_co, rel_trans_co,
                                  voxel_size, margin=1)
    invalid = psi == 0.0
    lap = jnp.exp(-truncdist * jnp.abs(psi) / assoc_sigma) / (2.0 * assoc_sigma)
    return lap, invalid


def association_weights(tsdf: jnp.ndarray, points_cam: jnp.ndarray,
                        rel_rot_co: jnp.ndarray, rel_trans_co: jnp.ndarray,
                        voxel_size, truncdist, assoc_sigma, alpha, uni_prior,
                        fg_prob_vol: jnp.ndarray | None = None):
    """Unnormalized association weight for one model.

    Background: ``alpha * laplace + (1-alpha) * uniPrior``, zeroed where the
    sample was invalid. Object model: laplace additionally multiplied by the
    trilinearly sampled foreground probability before mixing
    (``ObjTSDF.cpp:189-200``).

    Returns (weights, fg_prob_vals) — fg_prob_vals is None for background.
    """
    lap, invalid = compute_laplace(tsdf, points_cam, rel_rot_co, rel_trans_co,
                                   voxel_size, truncdist, assoc_sigma)
    fg_vals = None
    if fg_prob_vol is not None:
        fg_vals = sample_volume_at_points(fg_prob_vol, points_cam, rel_rot_co,
                                          rel_trans_co, voxel_size, margin=1)
        lap = lap * fg_vals
    w = alpha * lap + (1.0 - alpha) * uni_prior
    w = jnp.where(invalid, 0.0, w)
    return w, fg_vals


def normalize_associations(bg_weights: jnp.ndarray,
                           obj_weights: jnp.ndarray,
                           obj_active: jnp.ndarray):
    """Normalize association weights across models per pixel.

    ``obj_weights``: (MAX_OBJECTS, H, W); ``obj_active``: (MAX_OBJECTS,)
    bool — inactive slots contribute nothing and stay zero.
    Reference: ``EMFusion.cpp:653-669`` (sum then divide; 0/0 -> 0, matching
    cv::cuda::divide semantics).
    """
    obj_w = jnp.where(obj_active[:, None, None], obj_weights, 0.0)
    norm = bg_weights + jnp.sum(obj_w, axis=0)
    safe = jnp.where(norm > 0.0, norm, 1.0)
    bg_out = jnp.where(norm > 0.0, bg_weights / safe, 0.0)
    obj_out = jnp.where(norm > 0.0, obj_w / safe, 0.0)
    return bg_out, obj_out
