"""Detector-box -> square crop -> resize, fused on device as two matmuls.

TPU-native replacement for the reference dataloader's CPU crop path
(reference: data_load4.py:110-166, call stack SURVEY §3.4):

  bbox -> centered square box x1.05 -> clamp/shift into the 1920x1200 frame
  -> crop -> edge-pad bottom/right to square -> cv2.resize(INTER_LINEAR)
  -> record ``rate = out_size / crop_size``.

Instead of materializing the variable-size crop (a dynamic shape jit cannot
express), the output grid is sampled *directly* from the full-resolution
image.  Edge padding falls out of coordinate clamping: a clamped bilinear
sample past the crop boundary reproduces np.pad(..., 'edge') exactly.  The
bilinear sampling itself is expressed as two dense "tent-weight"
interpolation matmuls so it runs on the MXU rather than as a gather (the
slow path on TPU); no host round trip, no per-sample Python.

All box arithmetic replicates the reference's ``int()`` truncation so crops
are pixel-identical.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from esa_pose_estimation_tpu.core import linalg


def _trunc_int(x: jnp.ndarray) -> jnp.ndarray:
    """Python int() semantics: truncate toward zero."""
    return jnp.trunc(x).astype(jnp.int32)


@lru_cache(maxsize=8)
def _kmul_table(k: float, n: int = 4097, t_cap: int = 1 << 20
                ) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Exact host-computed f64 behavior of ``c ± k*h`` for integer h.

    Per h: (floor(k*h), thresh) where ``thresh`` is the largest integer t
    for which the fractional part of k*h still survives the f64
    subtraction ``t - k*h < t``.  Two f64 facts f32 cannot reproduce:
    which side of an integer each product lands on (``1.1*90`` =
    99.000…01 but ``1.05*20`` = 21.0 exactly), and that a near-integer
    excess is absorbed once |t| is large enough (``500 - 55.000…01`` =
    445.0 exactly).  Genuine fractional parts (>= 0.01) survive at every
    relevant magnitude, so their thresh is capped at ``t_cap``.
    """
    floors, threshs = [], []
    for h in range(n):
        y = k * float(h)
        m = int(y)
        floors.append(m)
        if y == float(m):
            threshs.append(0)              # exact product: no borrow ever
        else:
            f = y - m                      # the exact f64 fractional part
            lo, hi = 0, t_cap              # invariant: survives at lo+? ...
            # largest t with (t - f) < t, monotone in t -> binary search
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if (mid - f) < mid:
                    lo = mid
                else:
                    hi = mid - 1
            threshs.append(lo)
    return tuple(floors), tuple(threshs)


def _expand_box_int(c0: jnp.ndarray, c1: jnp.ndarray, half: jnp.ndarray,
                    k: float, table_size: int = 4097
                    ) -> tuple[jnp.ndarray, ...]:
    """``int(c ± k*half)`` with the reference's Python-float (f64)
    semantics, as integer arithmetic on a host-precomputed product table
    (exhaustively verified in tests/test_linemod_real.py).  With
    y = k*half = m + frac and t the integer part of the result:

      int(c - y) = c - m - 1 if 1 <= (c - m) <= thresh else c - m
      int(c + y) = c + m + 1 if -thresh <= (c + m) < 0 else c + m
    """
    # Size the table to the caller's frame (half <= max dim / 2 for any
    # in-frame box); the clip below is then a guard for degenerate
    # out-of-frame boxes only, never a silent wrong-product path.
    floors, threshs = _kmul_table(float(k), n=max(int(table_size), 2))
    tbl_m = jnp.asarray(floors, jnp.int32)
    tbl_t = jnp.asarray(threshs, jnp.int32)
    idx = jnp.clip(half, 0, tbl_m.shape[0] - 1)
    m = tbl_m[idx]
    thr = tbl_t[idx]

    def sub(c):
        t = c - m
        return t - ((t >= 1) & (t <= thr)).astype(jnp.int32)

    def add(c):
        t = c + m
        return t + ((t < 0) & (-t <= thr)).astype(jnp.int32)

    return sub(c0), sub(c1), add(c0), add(c1)


def adjust_bbox(bbox: jnp.ndarray, img_w: int = 1920, img_h: int = 1200,
                k: float = 1.05, force_square: bool = True
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Square-expand and clamp a detector box (data_load4.py:110-146).

    bbox: (..., 4) corners [x1, y1, x2, y2] (the reference's ``des['bbox']``
    layout produced by mask_to_bbox, data_load4.py:17-38).

    ``force_square=False`` is the submission-dataset variant
    (data_load_val.py:125-157): identical shift-back clamping, but the
    pre-clamp square-equalization step (data_load4.py:120-121) is commented
    out there (data_load_val.py:136-137), so truncation can leave the
    un-clamped box one pixel off square.

    Returns (origin (..., 2) int32 [x_new, y_new],
             crop_sizes (..., 2) int32 [xsize, ysize],
             size (...,) int32 — the padded square side).
    """
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    c0 = _trunc_int((x1 + x2) / 2)
    c1 = _trunc_int((y1 + y2) / 2)
    half = _trunc_int(jnp.maximum(x2 - x1, y2 - y1) / 2)

    x_new, y_new, w_new, h_new = _expand_box_int(
        c0, c1, half, k, table_size=max(img_w, img_h) + 2)
    if force_square:
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


def adjust_bbox_val(bbox: jnp.ndarray, img_w: int = 1920, img_h: int = 1200,
                    k: float = 1.05
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The ESAValDataSet submission crop box (data_load_val.py:125-157):
    the data_load4 rule without the square-equalization step."""
    return adjust_bbox(bbox, img_w, img_h, k, force_square=False)


def _interp_matrix(samples: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """Dense bilinear interpolation matrix from sample coordinates.

    samples: (..., out) source coordinates (already clamped to a valid
    range) -> (..., out, in_size) where row i is the bilinear "tent"
    weights max(0, 1 - |j - samples_i|).

    Gathers are the slow path on TPU; expressing the resampling as a dense
    matrix lets the whole crop+resize run as two MXU matmuls (measured
    ~20x faster than the gather formulation for 1920x1200 -> 128x128).
    """
    idx = jnp.arange(in_size, dtype=samples.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - samples[..., None]))


def crop_resize_single(image: jnp.ndarray, origin: jnp.ndarray,
                       crop_sizes: jnp.ndarray, size: jnp.ndarray,
                       out_size: int) -> jnp.ndarray:
    """Bilinear-sample one square crop to (out_size, out_size[, C])."""
    batched = crop_resize_from_boxes(
        image[None], origin[None], crop_sizes[None], size[None], out_size)
    return batched[0]


def crop_resize_from_boxes(images: jnp.ndarray, origin: jnp.ndarray,
                           crop_sizes: jnp.ndarray, size: jnp.ndarray,
                           out_size: int) -> jnp.ndarray:
    """Batched crop+resize from precomputed box geometry.

    images: (B, H, W) or (B, H, W, C); origin/crop_sizes: (B, 2);
    size: (B,).  cv2.resize INTER_LINEAR half-pixel convention; clamped
    sample coordinates reproduce edge padding exactly.  Implemented as two
    dense interpolation matmuls (see :func:`_interp_matrix`).

    Non-square crops (edge-of-frame boxes too large to shift back into
    the frame) reproduce the reference's pad call EXACTLY, including its
    swapped pad widths: ``np.pad(image, ((0, size-xsize), (0,
    size-ysize)), 'edge')`` (data_load4.py:151, data_load_val.py:168)
    pads *rows* by the width deficit and *columns* by the height deficit,
    so the pre-resize image is (ysize + size-xsize, xsize + size-ysize) —
    square only when xsize == ysize.  Equivalent sampling: each output
    axis is scaled by its own padded extent and edge-clamped to the true
    crop extent.
    """
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    sizef = size.astype(jnp.float32)
    xsize = crop_sizes[:, 0:1].astype(jnp.float32)
    ysize = crop_sizes[:, 1:2].astype(jnp.float32)
    pad_w = xsize + (sizef[:, None] - ysize)   # reference's swapped pads
    pad_h = ysize + (sizef[:, None] - xsize)

    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)[None, :]
    sx = jnp.clip(grid * (pad_w / out_size) - 0.5, 0.0, xsize - 1.0) \
        + origin[:, 0:1].astype(jnp.float32)
    sy = jnp.clip(grid * (pad_h / out_size) - 0.5, 0.0, ysize - 1.0) \
        + origin[:, 1:2].astype(jnp.float32)

    Wy = _interp_matrix(sy, h)                        # (B, out, H)
    Wx = _interp_matrix(sx, w)                        # (B, out, W)
    img = images.astype(jnp.float32)
    rows = linalg.einsum('byh,bhwc->bywc', Wy, img)   # (B, out, W, C)
    out = linalg.einsum('bxw,bywc->byxc', Wx, rows)   # (B, out, out, C)
    return out[..., 0] if squeeze else out


def crop_resize(images: jnp.ndarray, bboxes: jnp.ndarray, out_size: int,
                img_w: int = 1920, img_h: int = 1200, k: float = 1.05,
                force_square: bool = True
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched detect->crop->resize stage.

    images: (B, H, W) or (B, H, W, C); bboxes: (B, 4) corners.
    Returns (crops (B, out, out[, C]) float32,
             rates (B,) float32 — ``out_size / crop_size``,
             origins (B, 2) int32 — crop top-left [x_new, y_new]).

    ``force_square=False`` selects the submission-dataset box rule
    (ESAValDataSet, see :func:`adjust_bbox_val`).

    Keypoint transform parity (data_load4.py:172): crop-space keypoints are
    ``rate * (kp - origin)``; inverse uncrop is ``pred / rate + origin``
    (demo.py:246).
    """
    origin, crop_sizes, size = adjust_bbox(bboxes, img_w, img_h, k,
                                           force_square=force_square)
    crops = crop_resize_from_boxes(images, origin, crop_sizes, size, out_size)
    rates = out_size / size.astype(jnp.float32)
    return crops, rates, origin


def adjust_bbox_linemod(bbox: jnp.ndarray, img_w: int = 640,
                        img_h: int = 480, k: float = 1.1,
                        min_size: int = 128
                        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LINEMOD crop-box rule (data_load3.py:155-205, occlusion loader
    data_load3.py:309-360) — differs from the ESA rule:

    * half-extent floored at ``min_size/2`` BEFORE the margin (so the crop
      is never smaller than the model's input);
    * margin ``k = 1.1``;
    * clamp-shift into the 640x480 frame;
    * then GROW the clamped window back to ``max(min_size, left, down)``
      square, shifting inside the frame instead of edge-padding.

    bbox: (..., 4) corners [x1, y1, x2, y2].  Returns (origin (..., 2)
    int32, crop_sizes (..., 2) int32 [left, down], size (...,) int32 —
    the stretch target; rate parity is ``min_size / size``).
    Int arithmetic replicates the reference's ``int()`` truncation.
    """
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    c0 = _trunc_int((x1 + x2) / 2)
    c1 = _trunc_int((y1 + y2) / 2)
    half = _trunc_int(jnp.maximum(float(min_size),
                                  jnp.maximum(x2 - x1, y2 - y1)) / 2)

    x_new, y_new, w_new, h_new = _expand_box_int(
        c0, c1, half, k, table_size=max(img_w, img_h) + 2)
    h_new = jnp.where(w_new - x_new != h_new - y_new,
                      y_new + (w_new - x_new), h_new)
    # clamp-shift into the frame (data_load3.py:170-181)
    w_new = jnp.where(x_new < 0, w_new - x_new, w_new)
    x_new = jnp.maximum(x_new, 0)
    h_new = jnp.where(y_new < 0, h_new - y_new, h_new)
    y_new = jnp.maximum(y_new, 0)
    x_new = jnp.where(w_new > img_w, x_new + img_w - w_new, x_new)
    w_new = jnp.minimum(w_new, img_w)
    y_new = jnp.where(h_new > img_h, y_new + img_h - h_new, y_new)
    h_new = jnp.minimum(h_new, img_h)
    # Deviation from the reference for DEGENERATE boxes larger than the
    # frame: the far-edge shift above can push the origin negative, and
    # the reference then numpy-slices with a negative start — silently
    # cropping an arbitrary far corner (data_load3.py:200 with
    # x_new < 0).  Clamp to the full frame instead; such boxes never
    # occur in real LINEMOD data, and an in-frame window keeps the
    # keypoint transform rate*(kp - origin) meaningful.
    x_new = jnp.maximum(x_new, 0)
    y_new = jnp.maximum(y_new, 0)

    # grow back to square inside the frame (data_load3.py:182-205)
    left = w_new - x_new
    down = h_new - y_new
    size = jnp.maximum(min_size, jnp.maximum(left, down))

    dis = size - left
    grow_right = w_new + dis < img_w
    w_new = jnp.where((dis > 0) & grow_right, w_new + dis, w_new)
    x_shift = jnp.where((dis > 0) & ~grow_right, x_new - dis, x_new)
    w_new = jnp.where((dis > 0) & ~grow_right & (x_shift < 0),
                      w_new - x_shift, w_new)
    x_new = jnp.where((dis > 0) & ~grow_right, jnp.maximum(x_shift, 0),
                      x_new)

    dis = size - down
    grow_down = h_new + dis < img_h
    h_new = jnp.where((dis > 0) & grow_down, h_new + dis, h_new)
    y_shift = jnp.where((dis > 0) & ~grow_down, y_new - dis, y_new)
    h_new = jnp.where((dis > 0) & ~grow_down & (y_shift < 0),
                      h_new - y_shift, h_new)
    y_new = jnp.where((dis > 0) & ~grow_down, jnp.maximum(y_shift, 0),
                      y_new)

    # The reference's inner clamp can push the far edge past the frame
    # (h_new -= y_new with y_new < 0, data_load3.py:197-199); its numpy
    # slice then silently clamps to the frame.  Reproduce that clamp
    # explicitly so the emitted window is always inside the image.
    w_new = jnp.minimum(w_new, img_w)
    h_new = jnp.minimum(h_new, img_h)

    origin = jnp.stack([x_new, y_new], axis=-1)
    crop_sizes = jnp.stack([w_new - x_new, h_new - y_new], axis=-1)
    return origin, crop_sizes, size


def crop_resize_stretch(images: jnp.ndarray, origin: jnp.ndarray,
                        crop_sizes: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Batched crop+resize that stretches each axis independently to
    ``out_size`` (cv2.resize semantics on a possibly non-square window —
    the LINEMOD path, data_load3.py:211-215; the ESA path edge-pads
    instead, see :func:`crop_resize_from_boxes`)."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)[None, :]
    sx = grid * (crop_sizes[:, 0:1].astype(jnp.float32) / out_size) - 0.5 \
        + origin[:, 0:1].astype(jnp.float32)
    sy = grid * (crop_sizes[:, 1:2].astype(jnp.float32) / out_size) - 0.5 \
        + origin[:, 1:2].astype(jnp.float32)
    lo = origin.astype(jnp.float32)
    hi = (origin + crop_sizes).astype(jnp.float32) - 1.0
    sx = jnp.clip(sx, lo[:, 0:1], hi[:, 0:1])
    sy = jnp.clip(sy, lo[:, 1:2], hi[:, 1:2])
    Wy = _interp_matrix(sy, h)
    Wx = _interp_matrix(sx, w)
    img = images.astype(jnp.float32)
    rows = linalg.einsum('byh,bhwc->bywc', Wy, img)
    out = linalg.einsum('bxw,bywc->byxc', Wx, rows)
    return out[..., 0] if squeeze else out


def crop_resize_linemod(images: jnp.ndarray, bboxes: jnp.ndarray,
                        out_size: int, img_w: int = 640, img_h: int = 480,
                        k: float = 1.1
                        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LINEMOD detect->crop->resize (data_load3.py:155-215 semantics).

    Returns (crops, rates = out_size/size, origins).  Keypoint transform
    parity: ``rate * (kp - origin)`` (data_load3.py:230).
    """
    origin, crop_sizes, size = adjust_bbox_linemod(bboxes, img_w, img_h, k,
                                                   min_size=out_size)
    crops = crop_resize_stretch(images, origin, crop_sizes, out_size)
    rates = out_size / size.astype(jnp.float32)
    return crops, rates, origin


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_rgb(crops: jnp.ndarray,
                  mean: tuple[float, ...] = IMAGENET_MEAN,
                  std: tuple[float, ...] = IMAGENET_STD) -> jnp.ndarray:
    """uint8-range RGB crop (B, H, W, 3) -> per-channel normalized float
    (the LINEMOD transform, data_load3.py:78-88)."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (crops / 255.0 - m) / s


def normalize(crops: jnp.ndarray, mean: float = 0.449, std: float = 0.229
              ) -> jnp.ndarray:
    """uint8-range crop -> normalized float (data_load4.py:78-88 transforms:
    ToTensor (x/255) then Normalize(mean, std))."""
    return (crops / 255.0 - mean) / std
