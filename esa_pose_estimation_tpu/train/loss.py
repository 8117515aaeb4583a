"""Heatmap regression losses (functional JAX).

Transcribed semantics from the reference loss library (loss.py:9-156),
re-expressed branch-free with ``where`` masks (the torch code uses boolean
indexed assignment, which neither jits nor vectorizes):

* :func:`heatmap_wing` — ``HeatmapWing`` (loss.py:61-80), the loss actually
  used for ESA training, with the target-dependent wing width
  ``epsilon - y``.
* :func:`adaptive_wing` — ``AWing`` (loss.py:40-59).
* :func:`wing` — ``WingLoss`` (loss.py:99-114).
* :func:`smooth_l1` — ``Smooth_l1`` (loss.py:84-95).
* :func:`focal_l2` — ``focal_l2_loss`` (loss.py:9-31).
* :func:`wloss` — ``WLoss`` (loss.py:145-156).
* :func:`weighted_heatmap_loss` — ``Loss_weighted`` (loss.py:116-129):
  HeatmapWing * (W*M + 1), reduced by mean (main.py:380).

All functions operate on arbitrary shapes and return per-element loss maps
unless stated otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp


def heatmap_wing(y_pred: jnp.ndarray, y: jnp.ndarray, alpha: float = 2.1,
                 omega: float = 14.0, epsilon: float = 2.0,
                 theta: float = 0.5) -> jnp.ndarray:
    """HeatmapWing (reference loss.py:61-80).

    Near-field (|d| < theta): omega * log(1 + |d/(eps - y)|^(alpha - y));
    far-field: |d| - C with C = theta - omega * log(1 + (theta/(eps-y))^(alpha-y)).
    The ``epsilon - y`` denominator narrows the wing around peaks (y -> 1),
    weighting peak-pixel errors more strongly.
    """
    d = jnp.abs(y - y_pred)
    denom = epsilon - y                     # y in [0, 1], epsilon = 2 -> >= 1
    expo = alpha - y
    near = omega * jnp.log1p(jnp.abs(d / denom) ** expo)
    C = theta - omega * jnp.log1p((theta / denom) ** expo)
    far = d - C
    return jnp.where(d < theta, near, far)


def adaptive_wing(y_pred: jnp.ndarray, y: jnp.ndarray, alpha: float = 2.1,
                  omega: float = 14.0, epsilon: float = 1.0,
                  theta: float = 0.5) -> jnp.ndarray:
    """AWing (reference loss.py:40-59)."""
    d = jnp.abs(y - y_pred)
    expo = alpha - y
    A = (omega * (1.0 / (1.0 + (theta / epsilon) ** expo)) * expo
         * ((theta / epsilon) ** (expo - 1.0)) / epsilon)
    C = theta * A - omega * jnp.log1p((theta / epsilon) ** expo)
    near = omega * jnp.log1p(jnp.abs(d / epsilon) ** expo)
    far = A * d - C
    return jnp.where(d < theta, near, far)


def wing(y_pred: jnp.ndarray, y: jnp.ndarray, omega: float = 10.0,
         epsilon: float = 2.0, theta: float = 0.5) -> jnp.ndarray:
    """WingLoss (reference loss.py:99-114)."""
    d = jnp.abs(y - y_pred)
    C = theta - omega * jnp.log1p(theta / epsilon)
    return jnp.where(d < theta, omega * jnp.log1p(d / epsilon), d - C)


def smooth_l1(y_pred: jnp.ndarray, y: jnp.ndarray,
              theta: float = 0.5) -> jnp.ndarray:
    """Smooth_l1 (reference loss.py:84-95)."""
    d = jnp.abs(y - y_pred)
    return jnp.where(d < theta, 0.5 * d * d, d - 0.375)


def wloss(y_pred: jnp.ndarray, y: jnp.ndarray, omega: float = 10.0,
          epsilon: float = 2.0) -> jnp.ndarray:
    """WLoss (reference loss.py:145-156): a branchless log-wing,
    omega * log(1 + |d| / epsilon) everywhere (the reference computes a
    constant C but never applies it)."""
    return omega * jnp.log1p(jnp.abs(y_pred - y) / epsilon)


def focal_l2(y_pred: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
             gamma: float = 2.0) -> jnp.ndarray:
    """focal_l2_loss (reference loss.py:9-31); returns the per-sample sum
    over all but the leading axis."""
    st = jnp.where(y >= 0.01, y_pred, 1.0 - y_pred)
    factor = (1.0 - st) ** gamma
    out = (y_pred - y) ** 2 * factor * mask
    return jnp.sum(out, axis=tuple(range(1, out.ndim)))


def weighted_heatmap_loss(y_pred: jnp.ndarray, y: jnp.ndarray,
                          weight_map: jnp.ndarray, W: float = 10.0,
                          alpha: float = 2.1, omega: float = 14.0,
                          epsilon: float = 2.0,
                          theta: float = 0.5) -> jnp.ndarray:
    """Loss_weighted (reference loss.py:116-129) reduced to a scalar mean
    (main.py:378-380): mean(HeatmapWing(pred, y) * (W * M + 1))."""
    lm = heatmap_wing(y_pred, y, alpha, omega, epsilon, theta)
    return jnp.mean(lm * (W * weight_map + 1.0))
