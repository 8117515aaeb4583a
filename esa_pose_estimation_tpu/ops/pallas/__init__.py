from esa_pose_estimation_tpu.ops.pallas.peak_decode import (  # noqa: F401
    decode_heatmaps_pallas,
)
