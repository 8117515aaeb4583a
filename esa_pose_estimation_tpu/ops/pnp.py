"""RANSAC-EPnP initialization + weighted Levenberg-Marquardt pose refinement.

TPU-native replacement for the reference's full pose-solving tail:

* ``cv2.solvePnPRansac(reprojectionError=5.0, flags=SOLVEPNP_EPNP)``
  (reference: pnp.py:68-73) -> :func:`ransac_epnp`, a fixed-round hypothesis
  sweep with counted PRNG where "sampling a subset" is a weight mask, so all
  hypotheses solve as ONE vmapped EPnP batch on the MXU instead of a
  sequential CPU loop with early exit.
* the closed-source Ceres module ``cpnp.cpnp_m(p3d, p2d, maxvals, K, cam6)``
  (reference: demo.py:268, val.py:202) and the Ceres ``uncertainty_pnp``
  cost (reference: lib/utils/extend_utils/src/uncertainty_pnp.cpp:7-55) ->
  :func:`lm_refine`, a fixed-iteration damped Gauss-Newton on the 6-dof
  axis-angle+translation vector minimizing confidence-weighted reprojection
  residuals.  Scalar weights reproduce cpnp_m; a (2,2) covariance weight per
  point reproduces uncertainty_pnp's ``[wxx wxy; wxy wyy] (proj - obs)``.

Everything is static-shape, branch-free (accept/reject via ``where``),
f32 with K-normalized coordinates for conditioning, and batch-vmappable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import linalg
from esa_pose_estimation_tpu.core.camera import rodrigues, rotmat_to_rvec
from esa_pose_estimation_tpu.ops.epnp import (
    epnp_single,
    normalize_points_2d,
    reprojection_errors,
)

_EPS = 1e-12


class PnPResult(NamedTuple):
    R: jnp.ndarray          # (..., 3, 3)
    t: jnp.ndarray          # (..., 3)
    inliers: jnp.ndarray    # (..., N) bool
    cost: jnp.ndarray       # (...,) final weighted cost


# ---------------------------------------------------------------------------
# Levenberg-Marquardt refinement
# ---------------------------------------------------------------------------

def _residuals(theta: jnp.ndarray, points_3d: jnp.ndarray,
               norm_2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted reprojection residuals in normalized coords. -> (2N,)."""
    R = rodrigues(theta[:3])
    p_cam = linalg.einsum('ij,nj->ni', R, points_3d) + theta[3:]
    z = jnp.maximum(p_cam[:, 2], 1e-6)
    proj = p_cam[:, :2] / z[:, None]
    r = (proj - norm_2d) * w[:, None]
    return r.reshape(-1)


@partial(jax.jit, static_argnames=('iters',))
def lm_refine_single(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                     weights: jnp.ndarray, K: jnp.ndarray,
                     rvec0: jnp.ndarray, t0: jnp.ndarray,
                     iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LM refinement of one pose.  Returns (rvec, t, final_cost).

    weights: (N,) per-point confidence (heatmap peak value in the reference,
    val.py:192-202); zero weight removes a point.
    """
    norm_2d = normalize_points_2d(points_2d, K)
    theta0 = jnp.concatenate([rvec0, t0])

    def cost_fn(theta):
        r = _residuals(theta, points_3d, norm_2d, weights)
        return 0.5 * jnp.dot(r, r)

    def body(carry, _):
        theta, lam = carry
        r = _residuals(theta, points_3d, norm_2d, weights)
        J = jax.jacfwd(_residuals)(theta, points_3d, norm_2d, weights)
        H = linalg.matmul(J.T, J)
        g = J.T @ r
        damped = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-10))
        step = linalg.solve_psd(damped, -g, eps=1e-12)
        new_theta = theta + step
        old_cost = 0.5 * jnp.dot(r, r)
        new_cost = cost_fn(new_theta)
        accept = new_cost < old_cost
        theta = jnp.where(accept, new_theta, theta)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        return (theta, lam), None

    (theta, _), _ = jax.lax.scan(body, (theta0, jnp.asarray(1e-3, theta0.dtype)),
                                 None, length=iters)
    return theta[:3], theta[3:], cost_fn(theta)


def lm_refine(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
              weights: jnp.ndarray, K: jnp.ndarray,
              R0: jnp.ndarray, t0: jnp.ndarray,
              iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched LM refinement from a rotation-matrix initialization.

    Mirrors the reference call sequence Rodrigues -> cpnp_m -> Rodrigues
    (demo.py:263-275).  Leading batch dims vmapped.  Returns (R, t).
    """
    rvec0 = rotmat_to_rvec(R0)
    if points_3d.ndim == 2:
        rv, t, _ = lm_refine_single(points_3d, points_2d, weights, K,
                                    rvec0, t0, iters)
        return rodrigues(rv), t
    batch = points_3d.shape[:-2]
    Kb = jnp.broadcast_to(K, batch + (3, 3))
    fn = jax.vmap(partial(lm_refine_single, iters=iters))
    rv, t, _ = fn(points_3d.reshape((-1,) + points_3d.shape[-2:]),
                  points_2d.reshape((-1,) + points_2d.shape[-2:]),
                  weights.reshape((-1, weights.shape[-1])),
                  Kb.reshape(-1, 3, 3),
                  rvec0.reshape(-1, 3), t0.reshape(-1, 3))
    return (rodrigues(rv).reshape(batch + (3, 3)),
            t.reshape(batch + (3,)))


# ---------------------------------------------------------------------------
# RANSAC-EPnP
# ---------------------------------------------------------------------------

def _sample_masks(key: jax.Array, n_points: int, n_hyp: int,
                  sample_size: int, valid: jnp.ndarray) -> jnp.ndarray:
    """(n_hyp, N) one-hot-sum masks of `sample_size` distinct valid points.

    Sampling without replacement via per-hypothesis Gumbel top-k over the
    valid set — fully parallel, no rejection loops.
    """
    g = jax.random.gumbel(key, (n_hyp, n_points))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return jax.nn.one_hot(idx, n_points).sum(axis=1)       # (n_hyp, N)


@partial(jax.jit, static_argnames=('n_hypotheses', 'sample_size', 'lm_iters'))
def ransac_epnp_single(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                       K: jnp.ndarray, key: jax.Array,
                       valid: jnp.ndarray | None = None,
                       reproj_threshold: float = 5.0,
                       n_hypotheses: int = 64,
                       sample_size: int = 6,
                       lm_iters: int = 10) -> PnPResult:
    """RANSAC-EPnP for one problem (static shapes, all hypotheses batched).

    points_3d: (N, 3); points_2d: (N, 2) pixels; valid: (N,) bool mask of
    usable correspondences (replaces dynamic point-set gathering).

    The adaptive early-exit of the reference (confidence 0.99 loop) becomes a
    fixed `n_hypotheses` sweep — on TPU the batched solve of all hypotheses
    is cheaper than a data-dependent loop.
    """
    n = points_3d.shape[0]
    v = jnp.ones((n,), bool) if valid is None else valid
    vf = v.astype(points_3d.dtype)

    masks = _sample_masks(key, n, n_hypotheses, sample_size, v)

    Rh, th = jax.vmap(lambda m: epnp_single(points_3d, points_2d, K, m))(masks)
    errs = jax.vmap(
        lambda R, t: reprojection_errors(points_3d, points_2d, R, t, K)
    )(Rh, th)                                              # (H, N)

    inl = (errs < reproj_threshold) & v[None, :]
    n_inl = inl.sum(axis=-1)
    mean_err = jnp.sum(jnp.where(inl, errs, 0.0), axis=-1) / jnp.maximum(n_inl, 1)
    # Rank: most inliers, then lowest mean inlier error.
    score = n_inl.astype(errs.dtype) - mean_err / (reproj_threshold * 4.0)
    best = jnp.argmax(score)

    best_inl = inl[best]
    # Re-fit on inliers (weight mask), falling back to all-valid if the
    # hypothesis sweep found too few inliers to be meaningful.
    enough = best_inl.sum() >= 4
    fit_w = jnp.where(enough, best_inl.astype(vf.dtype), vf)
    R_fit, t_fit = epnp_single(points_3d, points_2d, K, fit_w)
    rv, t, cost = lm_refine_single(points_3d, points_2d, fit_w, K,
                                   rotmat_to_rvec(R_fit), t_fit, lm_iters)
    R = rodrigues(rv)
    final_inl = (reprojection_errors(points_3d, points_2d, R, t, K)
                 < reproj_threshold) & v
    return PnPResult(R=R, t=t, inliers=final_inl, cost=cost)


def ransac_epnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                K: jnp.ndarray, key: jax.Array,
                valid: jnp.ndarray | None = None,
                reproj_threshold: float = 5.0,
                n_hypotheses: int = 64,
                sample_size: int = 6,
                lm_iters: int = 10) -> PnPResult:
    """Batched RANSAC-EPnP; leading batch dims on the point arrays vmapped."""
    if points_3d.ndim == 2:
        return ransac_epnp_single(points_3d, points_2d, K, key, valid,
                                  reproj_threshold, n_hypotheses, sample_size,
                                  lm_iters)
    batch = points_3d.shape[:-2]
    nb = 1
    for s in batch:
        nb *= s
    keys = jax.random.split(key, nb)
    Kb = jnp.broadcast_to(K, batch + (3, 3)).reshape(-1, 3, 3)
    vb = (jnp.ones(points_3d.shape[:-1], bool) if valid is None else valid
          ).reshape(nb, -1)
    fn = jax.vmap(partial(ransac_epnp_single,
                          reproj_threshold=reproj_threshold,
                          n_hypotheses=n_hypotheses,
                          sample_size=sample_size, lm_iters=lm_iters))
    res = fn(points_3d.reshape((nb,) + points_3d.shape[-2:]),
             points_2d.reshape((nb,) + points_2d.shape[-2:]),
             Kb, keys, vb)
    return PnPResult(
        R=res.R.reshape(batch + (3, 3)),
        t=res.t.reshape(batch + (3,)),
        inliers=res.inliers.reshape(batch + (points_3d.shape[-2],)),
        cost=res.cost.reshape(batch),
    )


# ---------------------------------------------------------------------------
# Full pipeline solve (reference demo.py:261-275 / val.py:194-209 semantics)
# ---------------------------------------------------------------------------

def solve_pose(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
               confidences: jnp.ndarray, K: jnp.ndarray, key: jax.Array,
               select_mask: jnp.ndarray | None = None,
               reproj_threshold: float = 5.0,
               n_hypotheses: int = 64,
               lm_iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP-RANSAC init + confidence-weighted LM refine, batched.

    Reproduces the reference tail: select confident keypoints -> RANSAC EPnP
    -> cpnp_m refinement weighted by heatmap maxima.  `select_mask` plays the
    role of the dynamic top-k index set (see ops/peak.select_confident).

    Returns (R (..., 3, 3), t (..., 3)).
    """
    sel = (jnp.ones_like(confidences, bool) if select_mask is None
           else select_mask)
    init = ransac_epnp(points_3d, points_2d, K, key, valid=sel,
                       reproj_threshold=reproj_threshold,
                       n_hypotheses=n_hypotheses)
    w = jnp.where(sel, confidences, 0.0)
    return lm_refine(points_3d, points_2d, w, K, init.R, init.t, iters=lm_iters)
