from esa_pose_estimation_tpu.parallel import distributed  # noqa: F401
from esa_pose_estimation_tpu.parallel import mesh  # noqa: F401
from esa_pose_estimation_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicate,
    replicated,
    shard_batch,
    shard_state,
)
