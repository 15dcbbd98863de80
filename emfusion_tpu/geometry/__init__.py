from emfusion_tpu.geometry.se3 import (
    se3_exp, se3_log, so3_exp, so3_log, pose_compose, pose_inverse,
    transform_points, reorthonormalize,
)
from emfusion_tpu.geometry.camera import (
    backproject_depth, project_points, bilateral_filter, preprocess_depth,
)
from emfusion_tpu.geometry.sampling import (
    trilinear_sample, trilinear_sample_channels, world_to_grid, grid_to_world,
    sample_volume_at_points,
)

__all__ = [
    "se3_exp", "se3_log", "so3_exp", "so3_log", "pose_compose",
    "pose_inverse", "transform_points", "reorthonormalize",
    "backproject_depth", "project_points", "bilateral_filter",
    "preprocess_depth", "trilinear_sample", "trilinear_sample_channels",
    "world_to_grid", "grid_to_world", "sample_volume_at_points",
]
