"""Batched EPnP (Efficient Perspective-n-Point) in pure JAX.

TPU-native replacement for the reference's ``cv2.solvePnPRansac(...,
flags=SOLVEPNP_EPNP)`` initializer (reference: pnp.py:46-90, called from
demo.py:261 / val.py:194).  Design points that differ from an OpenCV port:

* **Weighted, fixed-shape formulation** — instead of gathering dynamic point
  subsets (impossible under jit), every solve takes a per-point weight
  vector.  RANSAC sampling, inlier re-fits and confidence weighting all
  become weight masks over the same static-(N) arrays.
* **Natively batched, flat leading dim, no eigh/svd in the hot path** —
  the 12x12 null-space extraction uses shifted inverse iteration
  (:func:`smallest_eigvecs` below) and the 3x3 rotation fit uses Newton
  polar decomposition (:func:`polar_rotation` below, with a closed-form
  ``core.linalg.smallest_eigvec3`` reflection fix); both are batched
  matmul/solve chains that run on ONE flattened batch axis.  General
  ``eigh``/``svd`` under nested ``vmap`` lower to per-element loops on TPU
  (measured ~1000x slower), which is exactly what this formulation avoids.
* **Shared precomputation** — the control frame, barycentric coordinates
  and each point's rank-2 contribution to M^T M depend only on the problem,
  not the mask; RANSAC over H hypotheses is H masked contractions +
  inverse-iteration null-space solves + Procrustes (see
  :class:`EpnpShared`).
* All contractions pinned to ``Precision.HIGHEST`` (see core/linalg.py);
  f32 is stable once image coordinates are normalized by K.

Algorithm (Lepetit, Moreno-Noguer, Fua, IJCV 2009): control points from
PCA -> barycentric coordinates -> 2N x 12 system -> smallest eigenvectors
of M^T M -> closed-form beta1 + Gauss-Newton on (b1..b4) over the 6
control-point distances -> weighted Procrustes for (R, t).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import linalg

_EPS = 1e-9
_PAIR_A = (0, 0, 0, 1, 1, 2)
_PAIR_B = (1, 2, 3, 2, 3, 3)


def normalize_points_2d(points_2d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera-plane coordinates: (u-cx)/fx, (v-cy)/fy."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (points_2d[..., 0] - cx[..., None]) / fx[..., None]
    y = (points_2d[..., 1] - cy[..., None]) / fy[..., None]
    return jnp.stack([x, y], axis=-1)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse via adjugate (batched, branch-free)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20,
                              jnp.where(det < 0, -1e-20, 1e-20), det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1)], axis=-2)
    return adj * inv_det[..., None, None]


def polar_rotation(M: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Nearest PROPER rotation to a (batched) 3x3 matrix via scaled Newton
    polar iteration (Higham): R <- (g R + (1/g) R^-T) / 2.

    Replaces the batched 3x3 SVD, which lowers to a slow iterative kernel
    on TPU (~5 us/matrix); this is straight-line elementwise math with a
    closed-form adjugate inverse.

    det<0 inputs (reflection-dominant covariances from weak-perspective /
    mirrored point clouds) need the Kabsch sign correction: the polar
    factor Q itself is then improper, and the nearest rotation is
    ``Q (I - 2 v v^T)`` with v the least principal direction of M —
    equivalent to SVD's ``U diag(1, 1, -1) V^T``.  (A previous revision
    multiplied M by sign(det) before the iteration and multiplied the
    result back, which algebraically returns exactly the improper Q.)
    """
    det = jnp.linalg.det(M)
    # normalize scale so the iteration starts well-conditioned
    X = M / jnp.maximum(
        jnp.linalg.norm(M, axis=(-2, -1), keepdims=True) / jnp.sqrt(3.0),
        1e-12)
    for _ in range(iters):
        Xi_t = jnp.swapaxes(_inv3(X), -1, -2)
        # Higham's 1-norm/inf-norm scale accelerant (Frobenius variant)
        nx = jnp.linalg.norm(X, axis=(-2, -1), keepdims=True)
        ni = jnp.linalg.norm(Xi_t, axis=(-2, -1), keepdims=True)
        g = jnp.sqrt(jnp.maximum(ni / jnp.maximum(nx, 1e-12), 1e-12))
        X = 0.5 * (g * X + Xi_t / g)
    # Kabsch correction: reflect along the least principal direction of
    # M^T M (the right singular vector of the smallest singular value).
    # Closed-form eigensolve, NOT fixed-iteration inverse iteration: the
    # latter under-converges when M's two smallest singular values are
    # close (53/2000 random reflected inputs came back with the wrong
    # reflection axis, up to ~90 deg of rotation error — exactly the
    # weak-perspective regime the det<0 branch exists to repair).
    MtM = linalg.einsum('...ji,...jk->...ik', M, M)
    v = linalg.smallest_eigvec3(MtM)                     # (..., 3), unit
    refl = jnp.eye(3, dtype=M.dtype) - 2.0 * v[..., :, None] * v[..., None, :]
    X_fixed = linalg.matmul(X, refl)
    return jnp.where((det < 0)[..., None, None], X_fixed, X)


def weighted_kabsch(src: jnp.ndarray, dst: jnp.ndarray,
                    weights: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment: R, t minimizing sum w ||R src + t - dst||^2.

    src, dst: (..., N, 3); weights: (..., N).  Batched over leading dims.
    The optimal rotation is the polar factor of the weighted covariance
    (computed with the Newton iteration above instead of SVD).
    """
    w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + _EPS)
    src_c = jnp.sum(w[..., None] * src, axis=-2)
    dst_c = jnp.sum(w[..., None] * dst, axis=-2)
    s = src - src_c[..., None, :]
    d = dst - dst_c[..., None, :]
    cov = linalg.einsum('...n,...ni,...nj->...ij', w, d, s)
    R = polar_rotation(cov)
    t = dst_c - linalg.einsum('...ij,...j->...i', R, src_c)
    return R, t


def _control_points(points_3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Four control points: weighted centroid + rms-scaled axis-aligned frame.

    points_3d: (..., N, 3); w: (..., N) -> (..., 4, 3).

    Any non-degenerate affine frame is a valid EPnP control frame; the
    PCA frame of the original paper buys nothing here but costs a batched
    3x3 eigh (slow, data-dependent QDWH on TPU), so we use the centroid
    plus axis-aligned offsets at the rms point spread.
    """
    wn = w / (jnp.sum(w, axis=-1, keepdims=True) + _EPS)
    c0 = jnp.sum(wn[..., None] * points_3d, axis=-2)
    centered = points_3d - c0[..., None, :]
    rms = jnp.sqrt(jnp.sum(wn[..., None] * centered ** 2, axis=(-2, -1))
                   / 3.0 + 1e-12)
    axes = rms[..., None, None] * jnp.eye(3, dtype=points_3d.dtype)
    return jnp.concatenate(
        [c0[..., None, :], c0[..., None, :] + axes], axis=-2)


def _gram_schmidt(X: jnp.ndarray) -> jnp.ndarray:
    """Orthonormalize the k columns of (..., 12, k) (modified Gram-Schmidt,
    unrolled — k is tiny)."""
    cols = []
    for j in range(X.shape[-1]):
        v = X[..., j]
        for u in cols:
            v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)
        cols.append(v)
    return jnp.stack(cols, axis=-1)


def smallest_eigvecs(A: jnp.ndarray, k: int = 4,
                     iters: int = 4) -> jnp.ndarray:
    """The k eigenvectors of smallest eigenvalue of a batched PSD matrix
    via ridge-shifted subspace inverse iteration.

    A: (..., 12, 12) -> (..., 12, k), first column ~ smallest.

    Replaces ``jnp.linalg.eigh``: XLA's eigh/svd lower to QDWH custom calls
    whose iteration count is data-dependent and hits worst case exactly on
    the near-singular matrices EPnP produces (measured ~650x slower than on
    well-conditioned inputs).  This is a fixed-iteration straight-line
    program: one Cholesky + 2k triangular solves per iteration.
    """
    m = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    ridge = (1e-6 * tr / m + 1e-12)[..., None, None]
    L = linalg.cholesky_small(A + ridge * jnp.eye(m, dtype=A.dtype))
    # Fixed full-rank start basis (deterministic; not axis-aligned so it is
    # never orthogonal to the target subspace in practice).
    import numpy as _np
    rng = _np.random.default_rng(12345)
    X0 = jnp.asarray(_np.linalg.qr(rng.normal(size=(m, k)))[0], A.dtype)
    X = jnp.broadcast_to(X0, A.shape[:-2] + (m, k))
    for _ in range(iters):
        X = _gram_schmidt(linalg.cho_solve_small(L, X))
    return X


def _barycentric(points_3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates wrt the 4 control points. -> (..., N, 4)."""
    B = jnp.swapaxes(ctrl[..., 1:, :] - ctrl[..., :1, :], -1, -2)  # (...,3,3)
    rhs = jnp.swapaxes(points_3d - ctrl[..., :1, :], -1, -2)       # (...,3,N)
    beta = jnp.swapaxes(linalg.solve(B, rhs), -1, -2)              # (...,N,3)
    alpha0 = 1.0 - jnp.sum(beta, axis=-1, keepdims=True)
    return jnp.concatenate([alpha0, beta], axis=-1)


def _ctrl_distances(ctrl: jnp.ndarray) -> jnp.ndarray:
    """The 6 pairwise distances between 4 control points. (..., 4, 3) -> (..., 6)."""
    ia = jnp.array(_PAIR_A)
    ib = jnp.array(_PAIR_B)
    diff = ctrl[..., ia, :] - ctrl[..., ib, :]
    return jnp.linalg.norm(diff, axis=-1)


def _refine_betas(betas0: jnp.ndarray, V: jnp.ndarray, dist_w: jnp.ndarray,
                  iters: int = 4) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on the 4 betas matching camera control-point distances
    to world distances (EPnP 'relinearization').

    betas0: (..., 4); V: (..., 4, 12); dist_w: (..., 6).  Unrolled with an
    analytic Jacobian — a short straight-line tensor program instead of
    jacfwd-in-a-loop.  Returns (betas, final distance cost (...,)) so a
    multi-seed caller can rank candidates.
    """
    ia = jnp.array(_PAIR_A)
    ib = jnp.array(_PAIR_B)
    Vc = V.reshape(V.shape[:-1] + (4, 3))          # (..., basis, ctrl, xyz)
    Vd = Vc[..., :, ia, :] - Vc[..., :, ib, :]     # (..., 4, 6, 3)

    def cost_of(b):
        diff = linalg.einsum('...k,...kpi->...pi', b, Vd)       # (..., 6, 3)
        dist = jnp.linalg.norm(diff, axis=-1)
        r = dist - dist_w                                       # (..., 6)
        return diff, dist, r, jnp.sum(r * r, axis=-1)

    betas = betas0
    _, _, _, cost = cost_of(betas)
    eye4 = jnp.eye(4, dtype=betas0.dtype)
    for _ in range(iters):
        diff, dist, r, _ = cost_of(betas)
        unit = diff / jnp.maximum(dist, 1e-9)[..., None]
        J = linalg.einsum('...pi,...kpi->...pk', unit, Vd)      # (..., 6, 4)
        H = linalg.einsum('...pk,...pl->...kl', J, J)
        # Scale-aware ridge: with few points the 4x4 normal matrix is
        # rank-deficient and an absolute 1e-9 vanishes under f32 rounding
        # of O(1) entries — the raw GN step then diverges (|betas| ~ 50
        # observed on a 6-point far-depth frame).
        ridge = 1e-6 * jnp.trace(H, axis1=-2, axis2=-1)[..., None, None]
        H = H + (ridge + 1e-9) * eye4
        g = linalg.einsum('...pk,...p->...k', J, r)
        cand = betas - linalg.solve_psd(H, g)
        # Monotone accept: reject steps that increase the distance
        # residual (cv2's EPnP caps beta magnitude instead; a rejected
        # step keeps the closed-form beta1 seed, which downstream
        # Procrustes + LM handle fine).
        _, _, _, new_cost = cost_of(cand)
        ok = (new_cost < cost)[..., None]
        betas = jnp.where(ok, cand, betas)
        cost = jnp.where(ok[..., 0], new_cost, cost)
    return betas, cost


def _beta_seeds(b1: jnp.ndarray, V: jnp.ndarray,
                dist_w: jnp.ndarray) -> jnp.ndarray:
    """Candidate beta seeds for the distance Gauss-Newton. -> (..., 4, 4).

    Seed 0 is the closed-form single-basis beta1; seeds 1-3 are the EPnP
    paper's N=2/3/4 approximations: solve the linearized 6-equation
    distance system for a restricted set of beta products, then extract
    betas by square roots (the ``find_betas_approx_{1,2,3}`` family in
    cv2's EPnP).  The multi-basis seeds are what rescue weak-perspective
    frames (far depth / few points): there the nullspace of M^T M has
    near-dimension > 1, the beta1-only reconstruction is meaningless, and
    gradient refinement from it converges to a severed local minimum
    (observed: 6-point frame at 25.7 m depth -> 30k px reprojection from
    seed 0 vs 0.4 px from seed 2).
    """
    ia = jnp.array(_PAIR_A)
    ib = jnp.array(_PAIR_B)
    Vc = V.reshape(V.shape[:-1] + (4, 3))
    Vd = Vc[..., :, ia, :] - Vc[..., :, ib, :]            # (..., 4, 6, 3)
    rho = dist_w * dist_w                                  # (..., 6)

    def dot(k, l):
        return jnp.sum(Vd[..., k, :, :] * Vd[..., l, :, :], axis=-1)

    def lstsq(cols):
        """cols: (..., 6, k) -> least-squares solution (..., k)."""
        k = cols.shape[-1]
        AtA = linalg.einsum('...pi,...pj->...ij', cols, cols)
        ridge = 1e-7 * jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
        AtA = AtA + (ridge + 1e-12) * jnp.eye(k, dtype=cols.dtype)
        Atb = linalg.einsum('...pi,...p->...i', cols, rho)
        return linalg.solve_psd(AtA, Atb)

    d00, d01, d11 = dot(0, 0), dot(0, 1), dot(1, 1)
    d02, d03, d12 = dot(0, 2), dot(0, 3), dot(1, 2)

    def sqrt_abs(x):
        return jnp.sqrt(jnp.abs(x))

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < 1e-12, 1e-12, b)

    zeros = jnp.zeros_like(b1)
    # N=2: unknowns [b11, b12, b22]
    x2 = lstsq(jnp.stack([d00, 2 * d01, d11], axis=-1))
    s2 = jnp.where(x2[..., 1] < 0, -1.0, 1.0)
    seed2 = jnp.stack([sqrt_abs(x2[..., 0]), s2 * sqrt_abs(x2[..., 2]),
                       zeros, zeros], axis=-1)
    # N=3: unknowns [b11, b12, b22, b13, b23]
    x3 = lstsq(jnp.stack([d00, 2 * d01, d11, 2 * d02, 2 * d12], axis=-1))
    b1_3 = sqrt_abs(x3[..., 0])
    s3 = jnp.where(x3[..., 1] < 0, -1.0, 1.0)
    seed3 = jnp.stack([b1_3, s3 * sqrt_abs(x3[..., 2]),
                       safe_div(x3[..., 3], b1_3), zeros], axis=-1)
    # N=4: unknowns [b11, b12, b13, b14]
    x4 = lstsq(jnp.stack([d00, 2 * d01, 2 * d02, 2 * d03], axis=-1))
    b1_4 = sqrt_abs(x4[..., 0])
    seed4 = jnp.stack([b1_4, safe_div(x4[..., 1], b1_4),
                       safe_div(x4[..., 2], b1_4),
                       safe_div(x4[..., 3], b1_4)], axis=-1)
    seed1 = jnp.stack([b1, zeros, zeros, zeros], axis=-1)
    return jnp.stack([seed1, seed2, seed3, seed4], axis=-2)


class EpnpShared(NamedTuple):
    """Per-problem precomputation shared by every weight mask / hypothesis.

    The control frame and barycentric coordinates are properties of the
    full point set (any non-degenerate affine frame is valid for every
    subset), and each point contributes a fixed rank-2 term to M^T M.
    """
    points_3d: jnp.ndarray    # (..., N, 3)
    alphas: jnp.ndarray       # (..., N, 4)
    G: jnp.ndarray            # (..., N, 12, 12)
    dist_w: jnp.ndarray       # (..., 6)


def epnp_precompute(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                    K: jnp.ndarray) -> EpnpShared:
    """Batched over leading dims of points_3d/points_2d."""
    n = points_3d.shape[-2]
    ones = jnp.ones(points_3d.shape[:-1], points_3d.dtype)
    norm_2d = normalize_points_2d(points_2d, K)
    ctrl = _control_points(points_3d, ones)
    alphas = _barycentric(points_3d, ctrl)
    u = norm_2d[..., 0]
    v = norm_2d[..., 1]
    zeros = jnp.zeros_like(alphas)
    rows_u = jnp.stack([alphas, zeros, -alphas * u[..., None]], axis=-1
                       ).reshape(points_3d.shape[:-2] + (n, 12))
    rows_v = jnp.stack([zeros, alphas, -alphas * v[..., None]], axis=-1
                       ).reshape(points_3d.shape[:-2] + (n, 12))
    G = (linalg.einsum('...ni,...nj->...nij', rows_u, rows_u)
         + linalg.einsum('...ni,...nj->...nij', rows_v, rows_v))
    return EpnpShared(points_3d=points_3d, alphas=alphas, G=G,
                      dist_w=_ctrl_distances(ctrl))


def epnp_reconstruct(shared: EpnpShared, w: jnp.ndarray,
                     refine_betas: bool = True) -> jnp.ndarray:
    """Camera-frame point reconstruction for weight mask(s). -> (..., N, 3).

    This is EPnP up to (but not including) the rigid-alignment step: the
    reconstruction projects directly (u = x/z), which is all RANSAC
    hypothesis scoring needs — no per-hypothesis Procrustes.
    """
    batch = jnp.broadcast_shapes(w.shape[:-1], shared.G.shape[:-3])
    MtM = linalg.einsum('...n,...nij->...ij', w, shared.G)
    MtM = jnp.broadcast_to(MtM, batch + (12, 12))
    nv = 4 if refine_betas else 1
    V = jnp.swapaxes(smallest_eigvecs(MtM, k=nv), -1, -2)   # (..., nv, 12)

    dist_w = jnp.broadcast_to(shared.dist_w, batch + (6,))
    ctrl1 = V[..., 0, :].reshape(batch + (4, 3))
    dist_c = _ctrl_distances(ctrl1)
    b1 = (jnp.sum(dist_c * dist_w, axis=-1)
          / (jnp.sum(dist_c * dist_c, axis=-1) + _EPS))
    if refine_betas:
        seeds = _beta_seeds(b1, V, dist_w)                  # (..., 4, 4)
        cand, cost = _refine_betas(seeds, V[..., None, :, :],
                                   dist_w[..., None, :])
        best = jnp.argmin(cost, axis=-1)
        betas = jnp.take_along_axis(
            cand, best[..., None, None], axis=-2)[..., 0, :]
    else:
        betas = b1[..., None]

    ctrl_cam = linalg.einsum('...k,...kj->...j', betas, V).reshape(
        batch + (4, 3))
    pts_cam = linalg.einsum('...na,...ai->...ni', shared.alphas, ctrl_cam)

    # Resolve the global sign: weighted mean depth must be positive.
    depth = (jnp.sum(w * pts_cam[..., 2], axis=-1)
             / (jnp.sum(w, axis=-1) + _EPS))
    return pts_cam * jnp.where(depth < 0, -1.0, 1.0)[..., None, None]


def mirror_cloud(pts_cam: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective mirror of a camera-frame cloud: reflection across
    the plane through the weighted centroid perpendicular to the line of
    sight.  Under weak perspective both clouds project near-identically —
    this is the two-fold bas-relief ambiguity."""
    wn = w / (jnp.sum(w, axis=-1, keepdims=True) + _EPS)
    c = jnp.sum(wn[..., None] * pts_cam, axis=-2)             # (..., 3)
    n = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), _EPS)
    d = linalg.einsum('...ni,...i->...n', pts_cam - c[..., None, :], n)
    return pts_cam - 2.0 * d[..., None] * n[..., None, :]


def epnp_from_mask(shared: EpnpShared, w: jnp.ndarray,
                   refine_betas: bool = True
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve EPnP for weight mask(s) using shared precomputation.

    Batched: ``shared`` fields and ``w`` (..., N) must share leading dims
    (broadcast them beforehand — e.g. shared (B, 1, ...) vs masks (B, H, N)).
    ``refine_betas=False`` skips the beta Gauss-Newton (closed-form beta1
    only).  Returns (R, t).

    The rigid alignment tries BOTH the reconstruction and its
    weak-perspective mirror and keeps the better rotation-consistent fit:
    the beta system is built from inter-point DISTANCES, which a mirrored
    reconstruction satisfies exactly, so on weak-perspective frames
    ``epnp_reconstruct`` can return the reflected cloud — no proper
    rotation aligns it, while its mirror (which projects to the same
    pixels) aligns with ~zero residual.  Selection is by the weighted
    Procrustes residual itself, no image-space data needed.
    """
    pts_cam = epnp_reconstruct(shared, w, refine_betas=refine_betas)
    batch = pts_cam.shape[:-2]
    p3 = jnp.broadcast_to(shared.points_3d, batch + shared.points_3d.shape[-2:])
    wb = jnp.broadcast_to(w, batch + (w.shape[-1],))
    pm = mirror_cloud(pts_cam, wb)

    def fit(target):
        R, t = weighted_kabsch(p3, target, wb)
        pred = linalg.einsum('...ij,...nj->...ni', R, p3) + t[..., None, :]
        res = jnp.sum(wb * jnp.sum((pred - target) ** 2, axis=-1), axis=-1)
        return R, t, res

    R1, t1, e1 = fit(pts_cam)
    R2, t2, e2 = fit(pm)
    pick = (e2 < e1)[..., None]
    R = jnp.where(pick[..., None], R2, R1)
    t = jnp.where(pick, t2, t1)
    return R, t


@partial(jax.jit, static_argnames=('refine_betas',))
def epnp_single(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                K: jnp.ndarray,
                weights: jnp.ndarray | None = None,
                refine_betas: bool = True
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP for one problem. points_3d: (N, 3); points_2d: (N, 2) pixels;
    K: (3, 3); weights: (N,) nonnegative (0 excludes a point).

    Returns (R (3, 3), t (3,)) with x_cam = R x_world + t.
    """
    n = points_3d.shape[0]
    w = jnp.ones((n,), points_3d.dtype) if weights is None else weights
    shared = epnp_precompute(points_3d, points_2d, K)
    return epnp_from_mask(shared, w, refine_betas=refine_betas)


def epnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray, K: jnp.ndarray,
         weights: jnp.ndarray | None = None,
         refine_betas: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched EPnP over any leading dims.

    points_3d: (..., N, 3); points_2d: (..., N, 2); K: (3, 3) or broadcast;
    weights: (..., N) or None.  Returns (R (..., 3, 3), t (..., 3)).
    """
    if weights is None:
        weights = jnp.ones(points_3d.shape[:-1], points_3d.dtype)
    shared = epnp_precompute(points_3d, points_2d, K)
    return epnp_from_mask(shared, weights, refine_betas=refine_betas)


def reprojection_errors(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
                        R: jnp.ndarray, t: jnp.ndarray,
                        K: jnp.ndarray) -> jnp.ndarray:
    """Per-point pixel reprojection error. -> (..., N)."""
    from esa_pose_estimation_tpu.core.camera import project_points
    proj = project_points(points_3d, R, t, K)
    return jnp.linalg.norm(proj - points_2d, axis=-1)
