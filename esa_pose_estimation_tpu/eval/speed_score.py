"""SPEED competition metric (ESA/Kelvins 2019).

TPU-native, batched transcription of the reference's score computation
(reference: demo.py:295-310):

  score_t = ||t_pred - t_gt||_2 / ||t_gt||_2
  score_r = 2 * arccos(|<q_pred, q_gt>|)
  speed   = score_t + score_r      (leaderboard sums the two)

plus the auxiliary translation/angular distances logged by the reference
(demo.py:312-323).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from esa_pose_estimation_tpu.core.camera import normalize_quat, rotmat_to_quat


class SpeedScores(NamedTuple):
    score_t: jnp.ndarray       # (...,) relative translation error
    score_r: jnp.ndarray       # (...,) rotation error [rad]
    speed: jnp.ndarray         # (...,) combined score
    trans_err: jnp.ndarray     # (..., 3) |dt| per axis
    angular_deg: jnp.ndarray   # (...,) rotation geodesic distance [deg]


def speed_score(q_pred: jnp.ndarray, t_pred: jnp.ndarray,
                q_gt: jnp.ndarray, t_gt: jnp.ndarray) -> SpeedScores:
    """Batched SPEED score.  Quaternions (w, x, y, z), any leading dims."""
    qp = normalize_quat(q_pred)
    qg = normalize_quat(q_gt)
    score_t = (jnp.linalg.norm(t_pred - t_gt, axis=-1)
               / jnp.linalg.norm(t_gt, axis=-1))
    dot = jnp.abs(jnp.sum(qp * qg, axis=-1))
    score_r = 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0))
    trans_err = jnp.abs(t_pred - t_gt)
    # angular distance in degrees via quaternion dot (equivalent to the
    # rotation-matrix trace formula at demo.py:316-319)
    angular_deg = jnp.degrees(score_r)
    return SpeedScores(score_t=score_t, score_r=score_r,
                       speed=score_t + score_r, trans_err=trans_err,
                       angular_deg=angular_deg)


def speed_score_from_matrices(R_pred: jnp.ndarray, t_pred: jnp.ndarray,
                              q_gt: jnp.ndarray,
                              t_gt: jnp.ndarray) -> SpeedScores:
    """Score directly from [R|t] solver output (demo.py:301-303 path)."""
    return speed_score(rotmat_to_quat(R_pred), t_pred, q_gt, t_gt)
