from esa_pose_estimation_tpu.utils import config  # noqa: F401
