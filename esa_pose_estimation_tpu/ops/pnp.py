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
    EpnpShared,
    epnp_from_mask,
    epnp_precompute,
    epnp_reconstruct,
    normalize_points_2d,
    reprojection_errors,
    weighted_kabsch,
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

def _proj_cost(R, t, points_3d, norm_2d, w):
    """(residuals (..., N, 2), cost (...,)) in normalized coordinates."""
    p = linalg.einsum('...ij,...nj->...ni', R, points_3d) + t[..., None, :]
    z = jnp.maximum(p[..., 2], 1e-6)
    proj = p[..., :2] / z[..., None]
    r = (proj - norm_2d) * w[..., None]
    return r, 0.5 * jnp.sum(r * r, axis=(-2, -1))


def _skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1)], axis=-2)


def _lm_refine_batched(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                       weights: jnp.ndarray, K: jnp.ndarray,
                       R0: jnp.ndarray, t0: jnp.ndarray,
                       iters: int = 20
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton over any leading batch dims, analytic Jacobian.

    The update is parameterized as a left increment ``R <- exp(delta) R``,
    ``t <- t + dt`` — the standard local SO(3) parameterization whose
    Jacobian is closed-form (``dp/ddelta = -[R x]_x``), so each iteration is
    straight-line tensor code: no jacfwd, no per-problem vmap, one batched
    6x6 Cholesky solve.  Accept/reject and damping adaptation are
    branchless (``where``).  Returns (R, t, final_cost).
    """
    norm_2d = normalize_points_2d(points_2d, K)
    eye6 = jnp.eye(6, dtype=points_3d.dtype)

    def body(carry, _):
        R, t, lam = carry
        p = linalg.einsum('...ij,...nj->...ni', R, points_3d) + t[..., None, :]
        z = jnp.maximum(p[..., 2], 1e-6)
        proj = p[..., :2] / z[..., None]
        r = (proj - norm_2d) * weights[..., None]          # (..., N, 2)
        cost = 0.5 * jnp.sum(r * r, axis=(-2, -1))

        # dproj/dp: (..., N, 2, 3)
        iz = 1.0 / z
        zero = jnp.zeros_like(iz)
        A = jnp.stack([
            jnp.stack([iz, zero, -p[..., 0] * iz * iz], axis=-1),
            jnp.stack([zero, iz, -p[..., 1] * iz * iz], axis=-1)], axis=-2)
        A = A * weights[..., None, None]
        Jd = linalg.einsum('...nij,...njk->...nik', A,
                           -_skew(p - t[..., None, :]))    # (..., N, 2, 3)
        J = jnp.concatenate([Jd, A], axis=-1)              # (..., N, 2, 6)

        H = linalg.einsum('...nik,...nil->...kl', J, J)    # (..., 6, 6)
        g = linalg.einsum('...nik,...ni->...k', J, r)      # (..., 6)
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        damped = H + lam[..., None, None] * (
            jnp.maximum(diag, 1e-10)[..., None] * eye6)
        step = -linalg.solve_psd(damped, g)

        R_new = linalg.matmul(rodrigues(step[..., :3]), R)
        t_new = t + step[..., 3:]
        _, new_cost = _proj_cost(R_new, t_new, points_3d, norm_2d, weights)
        accept = (new_cost < cost)[..., None, None]
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept[..., 0], t_new, t)
        lam = jnp.where(accept[..., 0, 0],
                        jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        return (R, t, lam), None

    # Batch shape must cover BOTH the problem arrays and the pose init:
    # lm_refine_dual refines (2, ...) candidate poses against shared
    # (..., N) problems, and the scan carry (lam) must be full-size from
    # step 0 or the carry shape changes mid-scan.
    batch = jnp.broadcast_shapes(points_3d.shape[:-2], R0.shape[:-2])
    R0 = jnp.broadcast_to(R0, batch + (3, 3))
    t0 = jnp.broadcast_to(t0, batch + (3,))
    lam0 = jnp.full(batch, 1e-3, points_3d.dtype)
    (R, t, _), _ = jax.lax.scan(body, (R0, t0, lam0), None, length=iters)
    _, cost = _proj_cost(R, t, points_3d, norm_2d, weights)
    return R, t, cost


def lm_refine(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
              weights: jnp.ndarray, K: jnp.ndarray,
              R0: jnp.ndarray, t0: jnp.ndarray,
              iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched LM refinement from a rotation-matrix initialization.

    Mirrors the reference call sequence Rodrigues -> cpnp_m -> Rodrigues
    (demo.py:263-275) with scalar confidence weights (cpnp_m semantics).
    Any leading batch dims.  Returns (R, t).
    """
    R, t, _ = _lm_refine_batched(points_3d, points_2d, weights, K, R0, t0,
                                 iters)
    return R, t


def mirror_pose(points_3d: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                weights: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The weak-perspective mirror of a pose, batched.

    At far depth the projection of a compact point cloud admits two
    rotations that reproject almost identically (the bas-relief / IPPE
    two-fold ambiguity): the second interpretation is the camera-frame
    cloud reflected across the plane through its centroid perpendicular
    to the line of sight.  Reflect, then re-fit a proper rotation by
    weighted Procrustes.  Returns (R_mirror, t_mirror).
    """
    from esa_pose_estimation_tpu.ops.epnp import mirror_cloud

    pc = linalg.einsum('...ij,...nj->...ni', R, points_3d) + t[..., None, :]
    pm = mirror_cloud(pc, weights)
    return weighted_kabsch(points_3d, pm, weights)


def lm_refine_dual(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                   weights: jnp.ndarray, K: jnp.ndarray,
                   R0: jnp.ndarray, t0: jnp.ndarray,
                   iters: int = 20,
                   evidence_fn=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LM-refine both the given pose and its weak-perspective mirror;
    keep whichever ends at lower weighted reprojection cost — or, when
    ``evidence_fn`` is given, at HIGHER external evidence (LM cost as the
    tiebreak within 1e-6).

    Resolves the far-depth two-fold rotation ambiguity that a single
    local refinement cannot escape (measured on trained-model eval
    frames at 20-29 m: 7 of 9 ~90-degree rotation flips recovered to
    <10 degrees; the rest are information-limited at ~1.5 px keypoint
    noise).  Both candidates refine as ONE batched LM over a new
    leading axis of size 2, so the cost is one extra LM problem per
    frame, not a second dispatch.

    ``evidence_fn(R, t) -> (...,) score`` scores candidate poses over the
    stacked leading axis; the serving pipeline passes reprojected-keypoint
    heatmap likelihood (the analogue of the reference weighting residuals
    by per-keypoint heatmap peaks in cpnp.cpnp_m, val.py:192-209) so the
    mirror choice uses the network's full spatial belief, not just the
    geometric fit of the already-decoded peaks.
    """
    Rm, tm = mirror_pose(points_3d, R0, t0, weights)
    Rb = jnp.stack([R0, Rm], axis=0)                   # (2, ..., 3, 3)
    tb = jnp.stack([t0, tm], axis=0)
    R, t, cost = _lm_refine_batched(points_3d[None], points_2d[None],
                                    weights[None], K[None], Rb, tb, iters)
    if evidence_fn is None:
        pick = jnp.argmin(cost, axis=0)                # (...,)
    else:
        ev = evidence_fn(R, t)                         # (2, ...)
        # higher evidence wins; near-ties (within 1e-6 of each other)
        # fall back to the LM cost so pure-noise evidence cannot flip a
        # clearly better geometric fit
        tie = jnp.abs(ev[0] - ev[1]) <= 1e-6 * (jnp.abs(ev).max(axis=0)
                                                + 1e-12)
        pick = jnp.where(tie, jnp.argmin(cost, axis=0),
                         jnp.argmax(ev, axis=0))
    R = jnp.take_along_axis(R, pick[None, ..., None, None], axis=0)[0]
    t = jnp.take_along_axis(t, pick[None, ..., None], axis=0)[0]
    return R, t


def heatmap_evidence(heatmaps_nhwc: jnp.ndarray, points_3d: jnp.ndarray,
                     K: jnp.ndarray, rates: jnp.ndarray,
                     origins: jnp.ndarray,
                     valid: jnp.ndarray | None = None):
    """Evidence closure for :func:`lm_refine_dual`: sum of bilinear
    heatmap values at each candidate pose's reprojected keypoints.

    heatmaps_nhwc: (B, S, S, Kp); points_3d: (B, Kp, 3); rates: (B,);
    origins: (B, 2); valid: (B, Kp) bool mask of keypoints to count.
    Returns ``fn(R, t) -> (..., B)`` accepting stacked candidates
    (2, B, 3, 3) / (2, B, 3).  Out-of-crop reprojections contribute zero
    (taps outside the heatmap have no support).
    """
    b, s = heatmaps_nhwc.shape[0], heatmaps_nhwc.shape[1]
    kp = heatmaps_nhwc.shape[-1]
    hm_flat = jnp.transpose(heatmaps_nhwc, (0, 3, 1, 2)).reshape(
        b, kp, s * s).astype(jnp.float32)               # (B, Kp, S*S)
    vmask = (jnp.ones((b, kp), jnp.float32) if valid is None
             else valid.astype(jnp.float32))

    batch_ndim = points_3d.ndim - 2                     # dims before (Kp, 3)

    def fn(R, t):
        lead = R.shape[:R.ndim - 2 - batch_ndim]        # e.g. (2,)
        p3 = jnp.broadcast_to(points_3d, lead + points_3d.shape)
        pc = linalg.einsum('...ij,...nj->...ni', R, p3) + t[..., None, :]
        z = jnp.maximum(pc[..., 2], 1e-6)
        xy = pc[..., :2] / z[..., None]
        fx, fy = K[..., 0, 0], K[..., 1, 1]
        cx, cy = K[..., 0, 2], K[..., 1, 2]
        if fx.ndim:                                     # per-batch K
            fx, fy, cx, cy = (a[..., None] for a in (fx, fy, cx, cy))
        px = xy[..., 0] * fx + cx                       # full-frame pixels
        py = xy[..., 1] * fy + cy
        cxp = (px - origins[..., 0:1].astype(jnp.float32)) \
            * rates[..., None]                          # crop space
        cyp = (py - origins[..., 1:2].astype(jnp.float32)) \
            * rates[..., None]
        x0 = jnp.floor(cxp).astype(jnp.int32)
        y0 = jnp.floor(cyp).astype(jnp.int32)
        fxw = cxp - x0
        fyw = cyp - y0
        flat = jnp.broadcast_to(hm_flat, lead + hm_flat.shape)

        def tap(yy, xx):
            inb = ((xx >= 0) & (xx < s) & (yy >= 0) & (yy < s))
            idx = jnp.clip(yy, 0, s - 1) * s + jnp.clip(xx, 0, s - 1)
            v = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
            return v * inb.astype(jnp.float32)

        val = (tap(y0, x0) * (1 - fxw) * (1 - fyw)
               + tap(y0, x0 + 1) * fxw * (1 - fyw)
               + tap(y0 + 1, x0) * (1 - fxw) * fyw
               + tap(y0 + 1, x0 + 1) * fxw * fyw)
        return (val * vmask).sum(axis=-1)               # (..., B)

    return fn


@partial(jax.jit, static_argnames=('iters',))
def lm_refine_single(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                     weights: jnp.ndarray, K: jnp.ndarray,
                     rvec0: jnp.ndarray, t0: jnp.ndarray,
                     iters: int = 20
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-problem LM from an axis-angle init.  Returns (rvec, t, cost)."""
    R, t, cost = _lm_refine_batched(points_3d, points_2d, weights, K,
                                    rodrigues(rvec0), t0, iters)
    return rotmat_to_rvec(R), t, cost


def _lm_refine_cov(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                   Wmat: jnp.ndarray, K: jnp.ndarray,
                   R0: jnp.ndarray, t0: jnp.ndarray,
                   iters: int = 20
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton with per-point 2x2 residual weight matrices.

    Residual per point: ``W_i @ (proj_i - obs_i)`` in pixels — the Ceres
    uncertainty-PnP cost (reference:
    lib/utils/extend_utils/src/uncertainty_pnp.cpp:7-55, weights
    ``[wxx wxy; wxy wyy]``).  Internally solves in normalized coordinates
    with the focal scaling folded into W (same optimum, better f32
    conditioning).
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    F = jnp.stack([
        jnp.stack([fx, jnp.zeros_like(fx)], axis=-1),
        jnp.stack([jnp.zeros_like(fy), fy], axis=-1)], axis=-2)
    Weff = linalg.matmul(Wmat, F[..., None, :, :])      # (..., N, 2, 2)
    norm_2d = normalize_points_2d(points_2d, K)
    eye6 = jnp.eye(6, dtype=points_3d.dtype)

    def residual(R, t):
        p = linalg.einsum('...ij,...nj->...ni', R, points_3d) + t[..., None, :]
        z = jnp.maximum(p[..., 2], 1e-6)
        proj = p[..., :2] / z[..., None]
        r = linalg.einsum('...nij,...nj->...ni', Weff, proj - norm_2d)
        return p, z, r

    def body(carry, _):
        R, t, lam = carry
        p, z, r = residual(R, t)
        cost = 0.5 * jnp.sum(r * r, axis=(-2, -1))
        iz = 1.0 / z
        zero = jnp.zeros_like(iz)
        A = jnp.stack([
            jnp.stack([iz, zero, -p[..., 0] * iz * iz], axis=-1),
            jnp.stack([zero, iz, -p[..., 1] * iz * iz], axis=-1)], axis=-2)
        A = linalg.einsum('...nij,...njk->...nik', Weff, A)
        Jd = linalg.einsum('...nij,...njk->...nik', A,
                           -_skew(p - t[..., None, :]))
        J = jnp.concatenate([Jd, A], axis=-1)               # (..., N, 2, 6)
        H = linalg.einsum('...nik,...nil->...kl', J, J)
        g = linalg.einsum('...nik,...ni->...k', J, r)
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        damped = H + lam[..., None, None] * (
            jnp.maximum(diag, 1e-10)[..., None] * eye6)
        step = -linalg.solve_psd(damped, g)
        R_new = linalg.matmul(rodrigues(step[..., :3]), R)
        t_new = t + step[..., 3:]
        _, _, r_new = residual(R_new, t_new)
        new_cost = 0.5 * jnp.sum(r_new * r_new, axis=(-2, -1))
        accept = (new_cost < cost)[..., None, None]
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept[..., 0], t_new, t)
        lam = jnp.where(accept[..., 0, 0],
                        jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        return (R, t, lam), None

    batch = points_3d.shape[:-2]
    lam0 = jnp.full(batch, 1e-3, points_3d.dtype)
    (R, t, _), _ = jax.lax.scan(body, (R0, t0, lam0), None, length=iters)
    _, _, r = residual(R, t)
    return R, t, 0.5 * jnp.sum(r * r, axis=(-2, -1))


def cov_to_weight(cov: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """2x2 covariance -> sqrtm-inverse weight matrix, closed form, batched.

    Parity with the reference's covariance-to-weight preprocessing for
    uncertainty PnP (evaluation.py:471-508 feeds scipy sqrtm-inverses of
    the voting covariances into the Ceres solver).  For SPD M:
    sqrt(M) = (M + sqrt(det) I) / sqrt(tr + 2 sqrt(det)); the weight is
    inv(sqrt(M + eps I)).
    """
    a = cov[..., 0, 0] + eps
    b = cov[..., 0, 1]
    c = cov[..., 1, 1] + eps
    s = jnp.sqrt(jnp.maximum(a * c - b * b, 1e-20))
    tau = jnp.sqrt(jnp.maximum(a + c + 2.0 * s, 1e-20))
    # sqrt(M) = [[a+s, b], [b, c+s]] / tau; invert it in closed form.
    det_sq = (a + s) * (c + s) - b * b
    inv_det = tau / jnp.maximum(det_sq, 1e-20)
    w00 = (c + s) * inv_det
    w11 = (a + s) * inv_det
    w01 = -b * inv_det
    return jnp.stack([
        jnp.stack([w00, w01], axis=-1),
        jnp.stack([w01, w11], axis=-1)], axis=-2)


def uncertainty_pnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                    covariance: jnp.ndarray, K: jnp.ndarray,
                    key: jax.Array | None = None,
                    n_hypotheses: int = 32,
                    iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Covariance-weighted PnP (the Ceres ``uncertainty_pnp`` equivalent,
    reference: lib/utils/extend_utils/extend_utils.py:64-115 +
    src/uncertainty_pnp.cpp:61-92).

    points_3d: (..., N, 3); points_2d: (..., N, 2); covariance:
    (..., N, 2, 2) per-keypoint 2D covariances (e.g. from
    ops.voting.estimate_voting_distribution_with_mean).

    Init: RANSAC-EPnP (the reference seeds with cv2 P3P on the 4 most
    confident points, extend_utils.py:84-101 — same role).  Refine: LM on
    the matrix-weighted reprojection residual.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    init = ransac_epnp(points_3d, points_2d, K, key,
                       n_hypotheses=n_hypotheses)
    W = cov_to_weight(covariance)
    R, t, _ = _lm_refine_cov(points_3d, points_2d, W, K, init.R, init.t,
                             iters)
    return R, t


# ---------------------------------------------------------------------------
# RANSAC-EPnP
# ---------------------------------------------------------------------------

def _sample_masks(key: jax.Array, batch: tuple[int, ...], n_points: int,
                  n_hyp: int, sample_size: int,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """(..., n_hyp, N) masks of `sample_size` distinct valid points.

    Sampling without replacement via Gumbel top-k over the valid set —
    fully parallel, no rejection loops.
    """
    g = jax.random.gumbel(key, batch + (n_hyp, n_points))
    g = jnp.where(valid[..., None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)                # (..., H, S)
    return jax.nn.one_hot(idx, n_points).sum(axis=-2)     # (..., H, N)


@partial(jax.jit, static_argnames=('n_hypotheses', 'sample_size', 'lm_iters'))
def ransac_epnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                K: jnp.ndarray, key: jax.Array,
                valid: jnp.ndarray | None = None,
                reproj_threshold: float = 5.0,
                n_hypotheses: int = 64,
                sample_size: int = 6,
                lm_iters: int = 10) -> PnPResult:
    """RANSAC-EPnP, natively batched over any leading dims.

    points_3d: (..., N, 3); points_2d: (..., N, 2) pixels; valid: (..., N)
    bool mask of usable correspondences (replaces dynamic point-set
    gathering).  All (batch x hypothesis) EPnP solves run as ONE flattened
    linear-algebra batch — the adaptive early-exit loop of the reference
    (confidence 0.99, ransac_voting_gpu.py-style) becomes a fixed
    `n_hypotheses` sweep, which on TPU is cheaper than data-dependent
    control flow.
    """
    batch = points_3d.shape[:-2]
    n = points_3d.shape[-2]
    v = jnp.ones(batch + (n,), bool) if valid is None else valid
    vf = v.astype(points_3d.dtype)

    sample_size = min(sample_size, n)   # small keypoint sets (>=4 for EPnP)
    masks = _sample_masks(key, batch, n, n_hypotheses, sample_size, v)
    # With fewer than 6 points the EPnP system (2n x 12) has a nullspace of
    # dimension > 1 and the closed-form beta1 solution is meaningless —
    # such hypotheses need the 4-basis beta Gauss-Newton.
    hyp_refine = sample_size < 6

    # Control frame / barycentric coords / per-point M^T M contributions are
    # shared across hypotheses; each hypothesis is one masked contraction +
    # eigh + Procrustes.  Hypotheses skip the multi-seed beta Gauss-Newton
    # (closed-form beta1 only): under normal perspective that classifies
    # inliers fine at a fraction of the cost.  In the weak-perspective
    # regime (far depth) beta1-only hypotheses all degenerate and find no
    # inliers — then `enough` below falls back to an all-valid refit whose
    # refine_betas=True path runs the full multi-seed solve, which recovers
    # such frames (see tests/test_pnp.py::TestFarDepthSixPoints).
    shared = epnp_precompute(points_3d, points_2d, K)
    shared_h = EpnpShared(
        points_3d=shared.points_3d[..., None, :, :],
        alphas=shared.alphas[..., None, :, :],
        G=shared.G[..., None, :, :, :],
        dist_w=shared.dist_w[..., None, :],
    )
    # Score hypotheses straight from the EPnP camera-frame reconstruction
    # (u = x/z): no per-hypothesis Procrustes, no rotation matrices.  The
    # reconstruction is exactly rigid for all-inlier samples, so inlier
    # classification is unchanged.
    pts_cam = epnp_reconstruct(shared_h, masks, refine_betas=hyp_refine)
    z = jnp.where(jnp.abs(pts_cam[..., 2]) < 1e-6, 1e-6, pts_cam[..., 2])
    proj = pts_cam[..., :2] / z[..., None]                        # (...,H,N,2)
    norm_2d = normalize_points_2d(points_2d, K)[..., None, :, :]
    # (..., 2) focal pair -> (..., 1, 1, 2) so a per-sample batched K
    # broadcasts across the hypothesis and point axes of proj
    fxy = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    dpix = (proj - norm_2d) * fxy[..., None, None, :]
    errs = jnp.linalg.norm(dpix, axis=-1)                         # (..., H, N)

    inl = (errs < reproj_threshold) & v[..., None, :]
    n_inl = inl.sum(axis=-1)                                      # (..., H)
    mean_err = (jnp.sum(jnp.where(inl, errs, 0.0), axis=-1)
                / jnp.maximum(n_inl, 1))
    # Rank: most inliers, then lowest mean inlier error.
    score = n_inl.astype(errs.dtype) - mean_err / (reproj_threshold * 4.0)
    best = jnp.argmax(score, axis=-1)                             # (...,)

    best_inl = jnp.take_along_axis(
        inl, best[..., None, None], axis=-2)[..., 0, :]           # (..., N)
    # Re-fit on inliers (weight mask), falling back to all-valid if the
    # hypothesis sweep found too few inliers to be meaningful.
    enough = (best_inl.sum(axis=-1) >= 4)[..., None]
    fit_w = jnp.where(enough, best_inl.astype(vf.dtype), vf)
    R_fit, t_fit = epnp_from_mask(shared, fit_w)
    R, t, cost = _lm_refine_batched(points_3d, points_2d, fit_w, K,
                                    R_fit, t_fit, lm_iters)
    final_inl = (reprojection_errors(points_3d, points_2d, R, t, K)
                 < reproj_threshold) & v
    return PnPResult(R=R, t=t, inliers=final_inl, cost=cost)


# ---------------------------------------------------------------------------
# Full pipeline solve (reference demo.py:261-275 / val.py:194-209 semantics)
# ---------------------------------------------------------------------------

def solve_pose(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
               confidences: jnp.ndarray, K: jnp.ndarray, key: jax.Array,
               select_mask: jnp.ndarray | None = None,
               reproj_threshold: float = 5.0,
               n_hypotheses: int = 64,
               lm_iters: int = 20,
               disambiguate: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP-RANSAC init + confidence-weighted LM refine, batched.

    Reproduces the reference tail: select confident keypoints -> RANSAC EPnP
    -> cpnp_m refinement weighted by heatmap maxima.  `select_mask` plays the
    role of the dynamic top-k index set (see ops/peak.select_confident).

    ``disambiguate`` (default on) additionally refines the weak-perspective
    mirror pose and keeps the lower-cost candidate — see
    :func:`lm_refine_dual`.  Costs one extra LM problem per frame; turn off
    only for close-range-only workloads where the ambiguity cannot arise.

    Returns (R (..., 3, 3), t (..., 3)).
    """
    sel = (jnp.ones_like(confidences, bool) if select_mask is None
           else select_mask)
    init = ransac_epnp(points_3d, points_2d, K, key, valid=sel,
                       reproj_threshold=reproj_threshold,
                       n_hypotheses=n_hypotheses)
    w = jnp.where(sel, confidences, 0.0)
    refine = lm_refine_dual if disambiguate else lm_refine
    return refine(points_3d, points_2d, w, K, init.R, init.t, iters=lm_iters)
