from esa_pose_estimation_tpu.train import checkpoint, loss, state  # noqa: F401
