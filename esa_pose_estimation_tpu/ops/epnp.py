"""Batched EPnP (Efficient Perspective-n-Point) in pure JAX.

TPU-native replacement for the reference's ``cv2.solvePnPRansac(...,
flags=SOLVEPNP_EPNP)`` initializer (reference: pnp.py:46-90, called from
demo.py:261 / val.py:194).  Design goals that differ from an OpenCV port:

* **Weighted, fixed-shape formulation** — instead of gathering dynamic point
  subsets (impossible under jit), every step takes a per-point weight vector.
  RANSAC sampling, inlier re-fits and confidence weighting all become weight
  masks over the same static-(N) arrays, so one compiled program serves all
  of them and vmaps cleanly over batch and hypothesis dimensions.
* All contractions pinned to ``Precision.HIGHEST`` (see core/linalg.py);
  the 12x12 null-space eigenproblem is f32-stable once coordinates are
  normalized by K.

Algorithm (Lepetit, Moreno-Noguer, Fua, IJCV 2009):
  control points from weighted PCA -> barycentric coordinates -> 2N x 12
  system -> smallest eigenvectors of M^T M -> beta1 closed form + Gauss-
  Newton refinement of (b1..b4) on the 6 inter-control-point distances ->
  weighted Procrustes for (R, t).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import linalg

_EPS = 1e-9


def normalize_points_2d(points_2d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera-plane coordinates: (u-cx)/fx, (v-cy)/fy."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (points_2d[..., 0] - cx[..., None]) / fx[..., None]
    y = (points_2d[..., 1] - cy[..., None]) / fy[..., None]
    return jnp.stack([x, y], axis=-1)


def weighted_kabsch(src: jnp.ndarray, dst: jnp.ndarray,
                    weights: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment: find R, t minimizing sum w ||R src + t - dst||^2.

    src, dst: (N, 3); weights: (N,).  Returns (R (3,3), t (3,)).
    """
    w = weights / (jnp.sum(weights) + _EPS)
    src_c = jnp.sum(w[:, None] * src, axis=0)
    dst_c = jnp.sum(w[:, None] * dst, axis=0)
    s = src - src_c
    d = dst - dst_c
    cov = linalg.einsum('n,ni,nj->ij', w, d, s)      # dst x src covariance
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(linalg.matmul(U, Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], cov.dtype)).at[2, 2].set(det)
    R = linalg.matmul(U, linalg.matmul(D, Vt))
    t = dst_c - R @ src_c
    return R, t


def _control_points(points_3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Four control points: weighted centroid + principal axes. -> (4, 3)."""
    wn = w / (jnp.sum(w) + _EPS)
    c0 = jnp.sum(wn[:, None] * points_3d, axis=0)
    centered = points_3d - c0
    cov = linalg.einsum('n,ni,nj->ij', wn, centered, centered)
    eigval, eigvec = jnp.linalg.eigh(cov)          # ascending
    # sqrt of (clamped) variances keeps the control frame well-scaled even
    # for near-planar point sets.
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-8))
    axes = eigvec * scale[None, :]                 # columns are scaled axes
    return jnp.concatenate([c0[None, :], c0[None, :] + axes.T], axis=0)


def _barycentric(points_3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates of each point wrt the 4 control points. -> (N, 4)."""
    B = (ctrl[1:] - ctrl[0]).T                     # (3, 3)
    rhs = (points_3d - ctrl[0]).T                  # (3, N)
    beta = linalg.solve(B, rhs).T                  # (N, 3)
    alpha0 = 1.0 - jnp.sum(beta, axis=-1, keepdims=True)
    return jnp.concatenate([alpha0, beta], axis=-1)


def _build_MtM(alphas: jnp.ndarray, norm_2d: jnp.ndarray,
               w: jnp.ndarray) -> jnp.ndarray:
    """M^T M (12x12) of the weighted EPnP linear system without materializing M.

    Row pair per point i (normalized intrinsics f=1, c=0):
      sum_j a_ij x_j            - u_i sum_j a_ij z_j = 0
      sum_j a_ij y_j            - v_i sum_j a_ij z_j = 0
    """
    n = alphas.shape[0]
    u = norm_2d[..., 0]
    v = norm_2d[..., 1]
    zeros = jnp.zeros_like(alphas)                  # (N, 4)
    # rows_u/rows_v: (N, 4, 3) -> (N, 12); column layout [x_j y_j z_j]*4.
    rows_u = jnp.stack([alphas, zeros, -alphas * u[:, None]], axis=-1)
    rows_v = jnp.stack([zeros, alphas, -alphas * v[:, None]], axis=-1)
    M = jnp.concatenate([rows_u.reshape(n, 12), rows_v.reshape(n, 12)], axis=0)
    ww = jnp.concatenate([w, w], axis=0)
    return linalg.einsum('n,ni,nj->ij', ww, M, M)


def _ctrl_cam_from_betas(betas: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame control points from basis combination. V: (4, 12) rows are
    the 4 smallest eigenvectors; betas: (4,). -> (4, 3)."""
    return jnp.einsum('k,kj->j', betas, V).reshape(4, 3)


def _ctrl_distances(ctrl: jnp.ndarray) -> jnp.ndarray:
    """The 6 pairwise distances between 4 control points. -> (6,)."""
    idx_a = jnp.array([0, 0, 0, 1, 1, 2])
    idx_b = jnp.array([1, 2, 3, 2, 3, 3])
    diff = ctrl[idx_a] - ctrl[idx_b]
    return jnp.linalg.norm(diff, axis=-1)


def _refine_betas(betas0: jnp.ndarray, V: jnp.ndarray, dist_w: jnp.ndarray,
                  iters: int = 8) -> jnp.ndarray:
    """Gauss-Newton on the 4 betas matching camera control-point distances to
    world distances (the 'relinearization' step of EPnP)."""

    def residual(betas):
        return _ctrl_distances(_ctrl_cam_from_betas(betas, V)) - dist_w

    def body(_, betas):
        r = residual(betas)
        J = jax.jacfwd(residual)(betas)            # (6, 4)
        H = linalg.matmul(J.T, J) + 1e-9 * jnp.eye(4, dtype=betas.dtype)
        g = J.T @ r
        return betas - linalg.solve(H, g)

    return jax.lax.fori_loop(0, iters, body, betas0)


@partial(jax.jit, static_argnames=())
def epnp_single(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                K: jnp.ndarray,
                weights: jnp.ndarray | None = None
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP for one problem. points_3d: (N, 3); points_2d: (N, 2) pixels;
    K: (3, 3); weights: (N,) nonnegative (0 excludes a point).

    Returns (R (3, 3), t (3,)) with x_cam = R x_world + t.
    """
    n = points_3d.shape[0]
    w = jnp.ones((n,), points_3d.dtype) if weights is None else weights
    norm_2d = normalize_points_2d(points_2d, K)

    ctrl_w = _control_points(points_3d, w)
    alphas = _barycentric(points_3d, ctrl_w)
    MtM = _build_MtM(alphas, norm_2d, w)
    _, eigvecs = jnp.linalg.eigh(MtM)              # ascending eigenvalues
    V = eigvecs[:, :4].T                           # (4, 12) smallest first

    dist_w = _ctrl_distances(ctrl_w)

    # beta1 closed form (N=1 case of the paper).
    ctrl1 = V[0].reshape(4, 3)
    dist_c = _ctrl_distances(ctrl1)
    b1 = jnp.sum(dist_c * dist_w) / (jnp.sum(dist_c * dist_c) + _EPS)
    betas0 = jnp.array([b1, 0.0, 0.0, 0.0], points_3d.dtype)
    betas = _refine_betas(betas0, V, dist_w)

    ctrl_cam = _ctrl_cam_from_betas(betas, V)
    pts_cam = linalg.matmul(alphas, ctrl_cam)      # (N, 3)

    # Resolve the global sign: weighted mean depth must be positive.
    depth = jnp.sum(w * pts_cam[:, 2]) / (jnp.sum(w) + _EPS)
    pts_cam = pts_cam * jnp.where(depth < 0, -1.0, 1.0)

    return weighted_kabsch(points_3d, pts_cam, w)


def epnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray, K: jnp.ndarray,
         weights: jnp.ndarray | None = None
         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched EPnP.  Leading batch dims on all args are vmapped.

    points_3d: (..., N, 3); points_2d: (..., N, 2); K: (3,3) or (..., 3, 3);
    weights: (..., N) or None.  Returns (R (..., 3, 3), t (..., 3)).
    """
    if points_3d.ndim == 2:
        return epnp_single(points_3d, points_2d, K,
                           weights if weights is not None else None)
    batch_shape = points_3d.shape[:-2]
    p3 = points_3d.reshape((-1,) + points_3d.shape[-2:])
    p2 = points_2d.reshape((-1,) + points_2d.shape[-2:])
    Kb = (jnp.broadcast_to(K, batch_shape + (3, 3)).reshape(-1, 3, 3)
          if K.ndim >= 2 else K)
    wb = (weights.reshape((-1,) + weights.shape[-1:])
          if weights is not None else None)
    if wb is None:
        R, t = jax.vmap(lambda a, b, k: epnp_single(a, b, k))(p3, p2, Kb)
    else:
        R, t = jax.vmap(epnp_single)(p3, p2, Kb, wb)
    return R.reshape(batch_shape + (3, 3)), t.reshape(batch_shape + (3,))


def reprojection_errors(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                        R: jnp.ndarray, t: jnp.ndarray,
                        K: jnp.ndarray) -> jnp.ndarray:
    """Per-point pixel reprojection error. -> (..., N)."""
    from esa_pose_estimation_tpu.core.camera import project_points
    proj = project_points(points_3d, R, t, K)
    return jnp.linalg.norm(proj - points_2d, axis=-1)
