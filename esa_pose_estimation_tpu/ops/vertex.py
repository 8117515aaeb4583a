"""Vertex-field (direction-field) target generation for PVNet-style models.

TPU-native replacement for the reference's per-pixel numpy loop
``compute_vertex_hcoords`` (reference: lib/datasets/linemod_dataset.py:69-82):
for every foreground pixel, the unit 2D vector toward each keypoint.  The
network regresses this field; ops/voting.py recovers keypoints from it.

Batched and fused: one broadcasted subtract + normalize over
(B, H, W, K, 2), masked by the foreground.
"""

from __future__ import annotations

import jax.numpy as jnp


def vertex_field(mask: jnp.ndarray, keypoints_2d: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """mask: (B, H, W) in {0,1}; keypoints_2d: (B, K, 2) pixel coords.

    Returns (B, H, W, K, 2) unit vectors (zero outside the mask) — the
    training target whose channel layout matches ops/voting.ransac_voting.
    """
    b, h, w = mask.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    dx = keypoints_2d[:, None, None, :, 0] - xs          # (B, H, W, K)
    dy = keypoints_2d[:, None, None, :, 1] - ys
    norm = jnp.sqrt(dx * dx + dy * dy) + eps
    field = jnp.stack([dx / norm, dy / norm], axis=-1)   # (B, H, W, K, 2)
    return field * mask[..., None, None]


def vertex_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                beta: float = 1.0) -> jnp.ndarray:
    """Masked smooth-L1 on the direction field (the PVNet vertex loss
    semantics: foreground pixels only, mean over valid elements)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    m = mask[..., None, None]
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m) * pred.shape[-1]
                                           * pred.shape[-2], 1.0)
