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
