"""emfusion-tpu: TPU-native dynamic object-level SLAM (EM-Fusion capabilities).

A from-scratch JAX/XLA/Pallas implementation of the EM-Fusion pipeline
(Strecke & Stueckler, ICCV 2019): per-object dense TSDF volumes with
probabilistic per-voxel E-step data association, direct SDF-gradient
Levenberg-Marquardt tracking of camera and object poses,
association-weighted TSDF fusion, multi-volume raycast compositing,
detector-driven object spawning/matching/deletion, and marching-cubes
mesh export -- designed for TPU hardware (static shapes, batched object
pools, device-resident LM loops, mesh-sharded volumes).

Reference behavior is documented against /root/reference (EmbodiedVision/
emfusion); this is a new TPU-first design, not a port.
"""

__version__ = "0.1.0"

from emfusion_tpu.config import Params, TSDFParams

__all__ = ["Params", "TSDFParams", "__version__"]
