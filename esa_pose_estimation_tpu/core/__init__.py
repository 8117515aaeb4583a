from esa_pose_estimation_tpu.core import camera  # noqa: F401
from esa_pose_estimation_tpu.core.camera import (  # noqa: F401
    LINEMOD_K,
    SPEED_K,
    normalize_quat,
    pose_to_matrix,
    project_axes,
    project_points,
    quat_to_dcm,
    quat_to_rotmat,
    rodrigues,
    rotmat_to_quat,
    rotmat_to_rvec,
)
