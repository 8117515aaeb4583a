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


def solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense solve for small systems (<= 12x12), batched."""
    return jnp.linalg.solve(a, b)


def solve_psd(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Solve a (batched) symmetric positive-definite system via Cholesky.

    Used for Levenberg-Marquardt normal equations; ``eps`` adds Tikhonov
    regularization on the diagonal.
    """
    if eps:
        a = a + eps * jnp.eye(a.shape[-1], dtype=a.dtype)
    L = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)
