"""esa_pose_estimation_tpu — a TPU-native spacecraft pose-estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
SPEED/Kelvins-2019 pipeline (YOLO detect -> HRNet keypoint heatmaps ->
EPnP/RANSAC + weighted Levenberg-Marquardt pose refinement), built for TPU:

* all compute-path ops are jittable, batched, static-shape (MXU/VPU friendly);
* parallelism is expressed as ``jax.sharding`` over a device mesh, not
  replicate/scatter/gather;
* the reference's native CUDA/Ceres kernels (ransac_voting, uncertainty_pnp,
  cpnp, inplace_abn) are re-designed as fused JAX/Pallas kernels.
"""

__version__ = "0.1.0"

from esa_pose_estimation_tpu.core import camera  # noqa: F401
