from esa_pose_estimation_tpu.data import synthetic  # noqa: F401
