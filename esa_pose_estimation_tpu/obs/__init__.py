from esa_pose_estimation_tpu.obs.logger import (  # noqa: F401
    JsonlLogger,
    TcpPusher,
    TsvLogger,
)
from esa_pose_estimation_tpu.obs.tbevents import TbWriter  # noqa: F401
