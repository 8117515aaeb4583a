"""Stateless train-time augmentation (device-side).

Equivalent of the reference's torchvision pipeline
``ColorJitter(0.1, 0.1, 0.05, 0.05)`` on grayscale crops
(reference: data_load4.py:78-83).  On single-channel images saturation and
hue are identities, leaving brightness (multiply by U[0.9, 1.1]) and
contrast (blend with the mean by U[0.9, 1.1]).  Implemented with counted
PRNG keys so augmentation is reproducible and jit-fusable into the input
pipeline — no host-side per-sample transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def color_jitter(key: jax.Array, crops: jnp.ndarray,
                 brightness: float = 0.1,
                 contrast: float = 0.1) -> jnp.ndarray:
    """crops: (B, H, W) or (B, H, W, C) in [0, 255].  Batched, fused."""
    kb, kc, ko = jax.random.split(key, 3)
    b = crops.shape[0]
    extra = (1,) * (crops.ndim - 1)
    bf = jax.random.uniform(kb, (b,) + extra,
                            minval=1.0 - brightness, maxval=1.0 + brightness)
    cf = jax.random.uniform(kc, (b,) + extra,
                            minval=1.0 - contrast, maxval=1.0 + contrast)
    order = jax.random.bernoulli(ko, 0.5, (b,) + extra)

    def apply_brightness(x):
        return jnp.clip(x * bf, 0.0, 255.0)

    def apply_contrast(x):
        mean = jnp.mean(x, axis=tuple(range(1, crops.ndim)), keepdims=True)
        return jnp.clip((x - mean) * cf + mean, 0.0, 255.0)

    # torchvision applies the jitter ops in random order; with two ops we
    # randomize which comes first per sample.
    a = apply_contrast(apply_brightness(crops))
    bimg = apply_brightness(apply_contrast(crops))
    return jnp.where(order, a, bimg)
