"""Detector-box -> square crop -> resize, as one fused on-device gather.

TPU-native replacement for the reference dataloader's CPU crop path
(reference: data_load4.py:110-166, call stack SURVEY §3.4):

  bbox -> centered square box x1.05 -> clamp/shift into the 1920x1200 frame
  -> crop -> edge-pad bottom/right to square -> cv2.resize(INTER_LINEAR)
  -> record ``rate = out_size / crop_size``.

Instead of materializing the variable-size crop (a dynamic shape jit cannot
express), the output grid is sampled *directly* from the full-resolution
image with one bilinear gather per output pixel.  Edge padding falls out of
coordinate clamping: a clamped bilinear sample past the crop boundary
reproduces np.pad(..., 'edge') exactly.  The whole batch is one gather that
XLA pipelines from HBM; no host round trip, no per-sample Python.

All box arithmetic replicates the reference's ``int()`` truncation so crops
are pixel-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _trunc_int(x: jnp.ndarray) -> jnp.ndarray:
    """Python int() semantics: truncate toward zero."""
    return jnp.trunc(x).astype(jnp.int32)


def adjust_bbox(bbox: jnp.ndarray, img_w: int = 1920, img_h: int = 1200,
                k: float = 1.05) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Square-expand and clamp a detector box (data_load4.py:110-146).

    bbox: (..., 4) corners [x1, y1, x2, y2] (the reference's ``des['bbox']``
    layout produced by mask_to_bbox, data_load4.py:17-38).

    Returns (origin (..., 2) int32 [x_new, y_new],
             crop_sizes (..., 2) int32 [xsize, ysize],
             size (...,) int32 — the padded square side).
    """
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    c0 = _trunc_int((x1 + x2) / 2)
    c1 = _trunc_int((y1 + y2) / 2)
    half = _trunc_int(jnp.maximum(x2 - x1, y2 - y1) / 2)

    x_new = _trunc_int(c0 - k * half.astype(jnp.float32))
    y_new = _trunc_int(c1 - k * half.astype(jnp.float32))
    w_new = _trunc_int(c0 + k * half.astype(jnp.float32))
    h_new = _trunc_int(c1 + k * half.astype(jnp.float32))
    # force square (data_load4.py:120-121)
    h_new = jnp.where(w_new - x_new != h_new - y_new,
                      y_new + (w_new - x_new), h_new)
    # clamp-shift into the frame (data_load4.py:123-140)
    w_new = jnp.where(x_new < 0, w_new - x_new, w_new)
    x_new = jnp.maximum(x_new, 0)
    h_new = jnp.where(y_new < 0, h_new - y_new, h_new)
    y_new = jnp.maximum(y_new, 0)

    over_w = w_new > img_w
    x_new = jnp.where(over_w, jnp.maximum(x_new + img_w - w_new, 0), x_new)
    w_new = jnp.where(over_w, img_w, w_new)
    over_h = h_new > img_h
    y_new = jnp.where(over_h, jnp.maximum(y_new + img_h - h_new, 0), y_new)
    h_new = jnp.where(over_h, img_h, h_new)

    xsize = w_new - x_new
    ysize = h_new - y_new
    size = jnp.maximum(xsize, ysize)
    origin = jnp.stack([x_new, y_new], axis=-1)
    crop_sizes = jnp.stack([xsize, ysize], axis=-1)
    return origin, crop_sizes, size


def crop_resize_single(image: jnp.ndarray, origin: jnp.ndarray,
                       crop_sizes: jnp.ndarray, size: jnp.ndarray,
                       out_size: int) -> jnp.ndarray:
    """Bilinear-sample one square crop to (out_size, out_size[, C]).

    image: (H, W) or (H, W, C) any float/int dtype; box args from
    :func:`adjust_bbox` (scalars).  cv2.resize INTER_LINEAR half-pixel
    convention; clamped sampling == edge padding.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[0], image.shape[1]
    sizef = size.astype(jnp.float32)
    scale = sizef / out_size                      # = 1 / rate

    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    # clamp to valid crop extent (edge pad + cv2 border replicate)
    sx = jnp.clip(grid, 0.0, crop_sizes[0].astype(jnp.float32) - 1.0)
    sy = jnp.clip(grid, 0.0, crop_sizes[1].astype(jnp.float32) - 1.0)
    sx = sx + origin[0].astype(jnp.float32)
    sy = sy + origin[1].astype(jnp.float32)

    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (sx - x0.astype(jnp.float32))[None, :, None]   # (1, W_out, 1)
    fy = (sy - y0.astype(jnp.float32))[:, None, None]   # (H_out, 1, 1)

    img = image.astype(jnp.float32)
    # two-stage separable gather: rows then columns
    top = img[y0]                                        # (H_out, W, C)
    bot = img[y1]
    rows = top * (1 - fy) + bot * fy                     # (H_out, W, C)
    left = rows[:, x0]                                   # (H_out, W_out, C)
    right = rows[:, x1]
    out = left * (1 - fx) + right * fx
    return out[..., 0] if squeeze else out


def crop_resize(images: jnp.ndarray, bboxes: jnp.ndarray, out_size: int,
                img_w: int = 1920, img_h: int = 1200, k: float = 1.05
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched detect->crop->resize stage.

    images: (B, H, W) or (B, H, W, C); bboxes: (B, 4) corners.
    Returns (crops (B, out, out[, C]) float32,
             rates (B,) float32 — ``out_size / crop_size``,
             origins (B, 2) int32 — crop top-left [x_new, y_new]).

    Keypoint transform parity (data_load4.py:172): crop-space keypoints are
    ``rate * (kp - origin)``; inverse uncrop is ``pred / rate + origin``
    (demo.py:246).
    """
    origin, crop_sizes, size = adjust_bbox(bboxes, img_w, img_h, k)
    fn = jax.vmap(lambda im, o, cs, s: crop_resize_single(im, o, cs, s, out_size))
    crops = fn(images, origin, crop_sizes, size)
    rates = out_size / size.astype(jnp.float32)
    return crops, rates, origin


def normalize(crops: jnp.ndarray, mean: float = 0.449, std: float = 0.229
              ) -> jnp.ndarray:
    """uint8-range crop -> normalized float (data_load4.py:78-88 transforms:
    ToTensor (x/255) then Normalize(mean, std))."""
    return (crops / 255.0 - mean) / std
