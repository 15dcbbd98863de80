"""Pallas (Mosaic) TPU kernels for the hot per-frame ops.

Design note: TPUs have no fast arbitrary gather — XLA lowers `jnp.take`
to a ~0.1 G/s scalar loop (measured on v5e), which makes the reference's
CUDA formulation (per-voxel random access into the depth image,
``src/core/cuda/TSDF.cu:327-427``) unusable. The only vectorized gather
Mosaic exposes is `tpu.dynamic_gather` over one axis of a 2-D tile
(per-lane row indices or per-sublane lane indices). Every kernel here is
therefore reformulated so its memory access pattern is a composition of
axis-aligned dynamic gathers:

  * fusion: per-z-slice the voxel->pixel map is a homography, so the
    depth lookup becomes a two-pass warp (closed-form index-corrected,
    Catmull-Smith style) = two dynamic gathers per slice.
  * raycast: plane-sweep re-formulation (see raycast_pallas).
"""

from emfusion_tpu.ops.pallas.fusion_pallas import (  # noqa: F401
    integrate_tsdf_pallas,
)
