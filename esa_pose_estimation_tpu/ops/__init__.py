from esa_pose_estimation_tpu.ops import heatmap, peak  # noqa: F401
