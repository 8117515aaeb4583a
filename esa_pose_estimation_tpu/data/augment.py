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


# ---------------------------------------------------------------------------
# PVNet/LINEMOD augmentation family (reference: lib/datasets/augmentation.py
# :45-315 — instance rotation, flip, occlusion mask-out, blur), re-designed
# as batched affine sampling + stateless PRNG instead of per-sample cv2.
# ---------------------------------------------------------------------------

def affine_sample(images: jnp.ndarray, matrices: jnp.ndarray,
                  nearest: bool = False, fill: float = 0.0) -> jnp.ndarray:
    """Inverse-warp images by per-sample 2x3 affine matrices.

    images: (B, H, W) or (B, H, W, C); matrices map OUTPUT pixel (x, y, 1)
    to input coordinates.  Bilinear (or nearest for masks), out-of-bounds
    filled with ``fill``.
    """
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    M = matrices
    sx = M[:, 0, 0, None, None] * xs + M[:, 0, 1, None, None] * ys \
        + M[:, 0, 2, None, None]
    sy = M[:, 1, 0, None, None] * xs + M[:, 1, 1, None, None] * ys \
        + M[:, 1, 2, None, None]
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))

    if nearest:
        xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        flat = images.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat, (yi * w + xi).reshape(b, -1, 1),
                                  axis=1).reshape(b, h, w, c)
    else:
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        flat = images.reshape(b, h * w, c)

        def gat(yy, xx):
            return jnp.take_along_axis(flat, (yy * w + xx).reshape(b, -1, 1),
                                       axis=1).reshape(b, h, w, c)

        out = (gat(y0, x0) * (1 - fx) * (1 - fy)
               + gat(y0, x1) * fx * (1 - fy)
               + gat(y1, x0) * (1 - fx) * fy
               + gat(y1, x1) * fx * fy)
    out = jnp.where(inside[..., None], out, fill)
    return out[..., 0] if squeeze else out


def _rotation_matrices(angles_deg: jnp.ndarray,
                       centers: jnp.ndarray) -> jnp.ndarray:
    """Output->input affines rotating by -angle about per-sample centers.
    angles_deg: (B,); centers: (B, 2).  -> (B, 2, 3)."""
    th = jnp.deg2rad(angles_deg)
    c, s = jnp.cos(th), jnp.sin(th)
    cx, cy = centers[:, 0], centers[:, 1]
    # inverse rotation: src = R^T (dst - c) + c
    m00, m01 = c, s
    m10, m11 = -s, c
    tx = cx - (m00 * cx + m01 * cy)
    ty = cy - (m10 * cx + m11 * cy)
    return jnp.stack([
        jnp.stack([m00, m01, tx], axis=-1),
        jnp.stack([m10, m11, ty], axis=-1)], axis=-2)


def random_rotate(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                  keypoints: jnp.ndarray, max_deg: float = 30.0
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Instance rotation about the mask centroid
    (augmentation.py rotate_instance semantics), batched.

    images: (B, H, W[, C]); masks: (B, H, W); keypoints: (B, K, 2).
    """
    b = masks.shape[0]
    angles = jax.random.uniform(key, (b,), minval=-max_deg, maxval=max_deg)
    msum = jnp.maximum(masks.sum(axis=(1, 2)), 1.0)
    xs = jnp.arange(masks.shape[2], dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(masks.shape[1], dtype=jnp.float32)[None, :, None]
    cx = (masks * xs).sum(axis=(1, 2)) / msum
    cy = (masks * ys).sum(axis=(1, 2)) / msum
    centers = jnp.stack([cx, cy], axis=-1)
    M = _rotation_matrices(angles, centers)
    out_img = affine_sample(images, M)
    out_mask = affine_sample(masks, M, nearest=True)
    # forward-transform keypoints: dst = R (kp - c) + c (inverse of M)
    th = jnp.deg2rad(angles)
    c, s = jnp.cos(th), jnp.sin(th)
    rel = keypoints - centers[:, None, :]
    kx = c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1]
    ky = s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
    out_kp = jnp.stack([kx, ky], axis=-1) + centers[:, None, :]
    return out_img, out_mask, out_kp


def random_flip(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                keypoints: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample horizontal flip (augmentation.py flip semantics)."""
    b, h, w = masks.shape[:3]
    do = jax.random.bernoulli(key, 0.5, (b,))
    img_flip = jnp.flip(images, axis=2)
    mask_flip = jnp.flip(masks, axis=2)
    sel = do.reshape((b,) + (1,) * (images.ndim - 1))
    images = jnp.where(sel, img_flip, images)
    masks = jnp.where(do[:, None, None], mask_flip, masks)
    kp_flip = keypoints.at[..., 0].set(w - 1 - keypoints[..., 0])
    keypoints = jnp.where(do[:, None, None], kp_flip, keypoints)
    return images, masks, keypoints


def random_occlusion(key: jax.Array, masks: jnp.ndarray,
                     max_frac: float = 0.3) -> jnp.ndarray:
    """Zero a random rectangle of the mask (mask-out occlusion aug,
    augmentation.py mask_out_instance semantics)."""
    b, h, w = masks.shape
    k1, k2, k3 = jax.random.split(key, 3)
    cx = jax.random.uniform(k1, (b, 1, 1), minval=0.0, maxval=w - 1.0)
    cy = jax.random.uniform(k2, (b, 1, 1), minval=0.0, maxval=h - 1.0)
    half = jax.random.uniform(k3, (b, 2), minval=2.0,
                              maxval=jnp.asarray([w, h], jnp.float32)
                              * max_frac / 2.0)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    inside = ((jnp.abs(xs - cx) < half[:, 0, None, None])
              & (jnp.abs(ys - cy) < half[:, 1, None, None]))
    return jnp.where(inside, 0.0, masks)


def random_blur(key: jax.Array, images: jnp.ndarray,
                prob: float = 0.5, sigma: float = 1.2,
                kernel: int = 5) -> jnp.ndarray:
    """Per-sample Gaussian blur with probability ``prob``
    (augmentation.py blur_image semantics).  images: (B, H, W)."""
    half = kernel // 2
    x = jnp.arange(kernel, dtype=jnp.float32) - half
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    arr = images[:, None]                                  # NCHW
    blurred = jax.lax.conv_general_dilated(
        arr, g.reshape(1, 1, kernel, 1), (1, 1),
        [(half, half), (0, 0)], dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    blurred = jax.lax.conv_general_dilated(
        blurred, g.reshape(1, 1, 1, kernel), (1, 1),
        [(0, 0), (half, half)], dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    do = jax.random.bernoulli(key, prob, (images.shape[0], 1, 1))
    return jnp.where(do, blurred[:, 0], images)
