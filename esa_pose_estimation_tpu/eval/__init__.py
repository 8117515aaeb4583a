from esa_pose_estimation_tpu.eval import evaluator, speed_score, submission  # noqa: F401
from esa_pose_estimation_tpu.eval.evaluator import AverageMeter  # noqa: F401
from esa_pose_estimation_tpu.eval.speed_score import (  # noqa: F401
    speed_score as compute_speed_score,
    speed_score_from_matrices,
)
from esa_pose_estimation_tpu.eval.submission import SubmissionWriter  # noqa: F401
