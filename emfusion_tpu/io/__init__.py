from emfusion_tpu.io.readers import RGBDFrame, TUMReader, CoFusionReader, make_reader
from emfusion_tpu.io.writers import (
    write_pose_file, write_ply, write_volume_bin, write_results,
)

__all__ = [
    "RGBDFrame", "TUMReader", "CoFusionReader", "make_reader",
    "write_pose_file", "write_ply", "write_volume_bin", "write_results",
]
