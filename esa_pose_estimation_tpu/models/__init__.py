from esa_pose_estimation_tpu.models.hrnet import HRNet  # noqa: F401
from esa_pose_estimation_tpu.models.resnet8s import (  # noqa: F401
    ResNet8s,
    resnet18_8s,
    resnet34_8s,
    resnet50_8s,
)
