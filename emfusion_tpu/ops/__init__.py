from emfusion_tpu.ops.fusion import integrate_tsdf, compute_gradients, integrate_fg_mask
from emfusion_tpu.ops.association import compute_laplace, association_weights, normalize_associations
from emfusion_tpu.ops.raycast import raycast_volume
from emfusion_tpu.ops.render import render_phong

__all__ = [
    "integrate_tsdf", "compute_gradients", "integrate_fg_mask",
    "compute_laplace", "association_weights", "normalize_associations",
    "raycast_volume", "render_phong",
]
