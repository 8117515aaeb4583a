"""Precision-pinned small linear algebra for geometry/solver code.

JAX's default matmul precision performs f32 contractions as bfloat16 passes
(fast on the MXU but ~1e-3 relative error).  That is the right trade for the
conv nets, and the wrong one for 3x3 rotation algebra, 6x6 normal equations
and EPnP null-space math, where it destroys pose accuracy.  All geometry and
solver modules route their contractions through these helpers, which pin
``lax.Precision.HIGHEST`` while leaving the global default untouched for the
model compute path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum(subscripts: str, *operands) -> jnp.ndarray:
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)


def _solve3_cramer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 solve (adjugate / det), any number of RHS.

    a: (..., 3, 3); b: (..., 3, k).  Replaces the LAPACK-style
    ``LuDecompositionBlock`` custom call, which serializes tiny batched
    problems on TPU (measured milliseconds for microseconds of math).
    """
    m = [[a[..., i, j] for j in range(3)] for i in range(3)]
    c00 = m[1][1] * m[2][2] - m[1][2] * m[2][1]
    c01 = m[1][2] * m[2][0] - m[1][0] * m[2][2]
    c02 = m[1][0] * m[2][1] - m[1][1] * m[2][0]
    det = m[0][0] * c00 + m[0][1] * c01 + m[0][2] * c02
    inv_det = 1.0 / det
    adj = [
        [c00, m[0][2] * m[2][1] - m[0][1] * m[2][2],
         m[0][1] * m[1][2] - m[0][2] * m[1][1]],
        [c01, m[0][0] * m[2][2] - m[0][2] * m[2][0],
         m[0][2] * m[1][0] - m[0][0] * m[1][2]],
        [c02, m[0][1] * m[2][0] - m[0][0] * m[2][1],
         m[0][0] * m[1][1] - m[0][1] * m[1][0]],
    ]
    rows = [sum((adj[i][j] * inv_det)[..., None] * b[..., j, :]
                for j in range(3)) for i in range(3)]
    return jnp.stack(rows, axis=-2)


def cholesky_small(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled batched Cholesky for tiny SPD systems (n <= 16).

    XLA lowers ``jnp.linalg.cholesky`` to a LAPACK-style ``Cholesky``
    custom call that is dramatically slower than the math for tiny
    matrices over large batches (the 12x12 EPnP normal-matrix factor over
    a (batch x hypothesis) axis measured 10 ms — a quarter of the whole
    serving pipeline).  Unrolling over the static n turns it into one
    fused elementwise loop over the batch.

    Unlike the custom call (where a negative pivot yields NaN via
    ``sqrt``), pivots are clamped to a tiny positive floor: a singular /
    slightly-indefinite input yields a garbage-but-FINITE factor instead
    of NaN-poisoning the whole batch.  Callers that solve near-singular
    systems (RANSAC hypothesis fits, beta refinement) reject bad
    solutions by residual, which only works if the solution is finite —
    f32 rounding of a PSD-but-singular matrix flips pivot signs
    depending on XLA fusion order (observed jit-vs-eager on the 6-point
    EPnP normal matrix), so this is a correctness guard, not a nicety.
    """
    n = a.shape[-1]
    col: list[list[jnp.ndarray]] = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - col[j][k] * col[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-25))
        col[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s2 = a[..., i, j]
            for k in range(j):
                s2 = s2 - col[i][k] * col[j][k]
            col[i][j] = s2 * inv
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(n)],
                      axis=-1) for i in range(n)]
    return jnp.stack(rows, axis=-2)


def cho_solve_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L L^T x = b`` by unrolled forward/back substitution.

    L: (..., n, n) from :func:`cholesky_small`; b: (..., n, k).
    Replaces two ``TriangularSolve`` custom calls per application.
    """
    n = L.shape[-1]
    ys: list[jnp.ndarray] = []
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * ys[k]
        ys.append(s / L[..., i, i, None])
    xs: list[jnp.ndarray] = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * xs[k]
        xs[i] = s / L[..., i, i, None]
    return jnp.stack(xs, axis=-2)


def _det3(a: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 determinant."""
    return (a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2]
                            - a[..., 1, 2] * a[..., 2, 1])
            - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2]
                              - a[..., 1, 2] * a[..., 2, 0])
            + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1]
                              - a[..., 1, 1] * a[..., 2, 0]))


def eigvals3_sym(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Eigenvalues of a batched symmetric 3x3, closed form (trig method).

    Returns ``(lmin, lmid, lmax)``, each shaped like ``A[..., 0, 0]``.
    Straight-line math (no QDWH/eigh custom call); exact up to f32
    rounding of the characteristic polynomial.
    """
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(B * B, axis=(-2, -1)) / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    # normalize BEFORE the determinant: det(B)/p^3 as written would form
    # 2e-90, which flushes to 0 in f32 and turns isotropic/zero inputs
    # (p = 0, det = 0) into 0/0 = NaN through arccos
    r = jnp.clip(_det3(B / safe_p[..., None, None]) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    return lmin, 3.0 * q - lmax - lmin, lmax


def smallest_eigvec3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a batched symmetric
    3x3 matrix. (..., 3, 3) -> (..., 3). Branch-free closed form.

    Fixed-iteration inverse iteration (``ops.epnp.smallest_eigvecs``) does
    NOT converge when the two smallest eigenvalues are close — measured on
    reflected Kabsch covariances, 53/2000 random cases returned a vector
    up to 90 degrees off, which silently broke the mirror-pose rescue
    path.  This instead takes the exact eigenvalue from
    :func:`eigvals3_sym` and reads the null space of ``C = A - lmin*I``
    off cross products of its rows (the largest of the three; rank(C)=2
    for a simple eigenvalue).  Degenerate cases fall back branch-freely:

    * ``lmin`` repeated (C rank 1): any unit vector orthogonal to C's
      largest row spans the eigenplane — every choice is an eigenvector,
      and for the Kabsch det<0 correction every choice yields an equally
      near rotation.
    * triple eigenvalue (A ~ l*I, C ~ 0): every unit vector works; e_x.
    """
    lmin, _, lmax = eigvals3_sym(A)
    scale = jnp.maximum(jnp.maximum(jnp.abs(lmin), jnp.abs(lmax)), 1e-30)
    C = A - lmin[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where((n02 > n01)[..., None], c02, c01)
    bestn = jnp.maximum(n01, n02)
    best = jnp.where((n12 > bestn)[..., None], c12, best)
    bestn = jnp.maximum(bestn, n12)

    # rank-1 fallback: largest row of C is ~ the lmax eigendirection u;
    # cross with the coordinate axis least aligned to u gives a unit
    # vector in the (repeated-lmin) eigenplane.
    rn0 = jnp.sum(r0 * r0, axis=-1)
    rn1 = jnp.sum(r1 * r1, axis=-1)
    rn2 = jnp.sum(r2 * r2, axis=-1)
    u = jnp.where((rn1 > rn0)[..., None], r1, r0)
    un = jnp.maximum(rn0, rn1)
    u = jnp.where((rn2 > un)[..., None], r2, u)
    un = jnp.maximum(un, rn2)
    ex = jnp.zeros_like(u).at[..., 0].set(1.0)
    ey = jnp.zeros_like(u).at[..., 1].set(1.0)
    axis = jnp.where(
        (jnp.abs(u[..., 0]) ** 2 < 0.8 * un)[..., None], ex, ey)
    plane = jnp.cross(u, axis)

    # trust the cross product when it clears f32 rounding of C (entries
    # carry ~eps*scale error, so cross products carry ~eps*scale^2; row
    # norms carry ~eps*scale)
    cross_tol2 = (1e-5 * scale * scale) ** 2
    row_tol2 = (1e-5 * scale) ** 2
    v = jnp.where((bestn > cross_tol2)[..., None], best,
                  jnp.where((un > row_tol2)[..., None], plane, ex))
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           1e-30)


def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense solve for small systems (<= 12x12), batched."""
    if a.shape[-1] == 3:
        return _solve3_cramer(a, b)
    return jnp.linalg.solve(a, b)


def solve_psd(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Solve a (batched) symmetric positive-definite system via Cholesky.

    Used for Levenberg-Marquardt normal equations; ``eps`` adds Tikhonov
    regularization on the diagonal.  ``b`` may be (..., n) or (..., n, k).
    """
    if eps:
        a = a + eps * jnp.eye(a.shape[-1], dtype=a.dtype)
    if a.shape[-1] <= 16:
        L = cholesky_small(a)
        if b.ndim == a.ndim - 1:
            return cho_solve_small(L, b[..., None])[..., 0]
        return cho_solve_small(L, b)
    L = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)
