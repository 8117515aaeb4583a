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


# ---------------------------------------------------------------------------
# PVNet crop/resize augmentation family (reference:
# lib/datasets/augmentation.py:75-313) — the training-path set used by
# LineModDatasetRealAug.augmentation (linemod_dataset.py:256-293):
# crop_or_padding_to_fixed_size(_instance), crop_resize_instance_v1/v2,
# crop_or_padding, add_noise.
#
# TPU-first redesign: every op is a batched program with STATIC output
# shapes.  The reference's per-sample cv2 crop/resize chains are all
# separable scale+translate resamplings, so each op builds per-sample 1-D
# interpolation matrices (cv2 INTER_LINEAR tent weights / INTER_NEAREST
# floor rule) and applies them as two dense matmuls on the MXU — the same
# formulation as ops/crop.py.  Zero-padding outside the source falls out
# of the tent weights having no column to land on.  Randomness is split
# out: deterministic cores take the sampled parameters explicitly (pinned
# against the actual reference functions in
# tests/test_reference_aug_parity.py), and random_* wrappers draw them
# with stateless jax PRNG.
# ---------------------------------------------------------------------------


def _tent_matrix(coords: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """cv2 INTER_LINEAR weights: (B, out) sample coords -> (B, out, in).
    Taps outside [0, in) simply have no column — i.e. zero padding."""
    idx = jnp.arange(in_size, dtype=coords.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - coords[..., None]))


def _nearest_matrix(idx: jnp.ndarray, valid: jnp.ndarray,
                    in_size: int) -> jnp.ndarray:
    """cv2 INTER_NEAREST one-hot rows: (B, out) int32 source indices ->
    (B, out, in); rows with ``valid`` False are all-zero (pad)."""
    cols = jnp.arange(in_size, dtype=jnp.int32)
    onehot = (cols == jnp.clip(idx, 0, in_size - 1)[..., None])
    return (onehot & valid[..., None]).astype(jnp.float32)


def _apply_separable(images: jnp.ndarray, Wy: jnp.ndarray,
                     Wx: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W[, C]) x row/col matrices -> (B, out_h, out_w[, C])."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    img = images.astype(jnp.float32)
    rows = jnp.einsum('byh,bhwc->bywc', Wy, img)
    out = jnp.einsum('bxw,bywc->byxc', Wx, rows)
    return out[..., 0] if squeeze else out


def window_shift(images: jnp.ndarray, offsets: jnp.ndarray,
                 out_h: int, out_w: int,
                 nearest: bool = True) -> jnp.ndarray:
    """out[y, x] = in[y + dy, x + dx], zero outside — the pure
    integer-window core of crop_or_padding_to_fixed_size(_instance)
    (augmentation.py:118-185: crop at a sampled begin when the target is
    smaller, centre-pad with zeros when larger; both are one integer
    offset per axis).

    images: (B, H, W[, C]); offsets: (B, 2) int32 [dy, dx] (source begin
    minus output begin).
    """
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    oy = jnp.arange(out_h, dtype=jnp.int32)[None, :] + offsets[:, 0:1]
    ox = jnp.arange(out_w, dtype=jnp.int32)[None, :] + offsets[:, 1:2]
    Wy = _nearest_matrix(oy, (oy >= 0) & (oy < h), h)
    Wx = _nearest_matrix(ox, (ox >= 0) & (ox < w), w)
    out = _apply_separable(images, Wy, Wx)
    return out


def fixed_size_offsets(in_h: int, in_w: int, out_h: int, out_w: int,
                       hbeg: jnp.ndarray, wbeg: jnp.ndarray) -> jnp.ndarray:
    """The crop_or_padding_to_fixed_size offset rule (augmentation.py:
    160-185): crop at the sampled begin when out < in, centre-pad when
    out >= in (the sampled begin is ignored then, :162-165,177-178).
    hbeg/wbeg: (B,) int32.  Returns (B, 2) [dy, dx]."""
    dy = jnp.where(out_h >= in_h,
                   -jnp.asarray((out_h - in_h) // 2, jnp.int32), hbeg)
    dx = jnp.where(out_w >= in_w,
                   -jnp.asarray((out_w - in_w) // 2, jnp.int32), wbeg)
    return jnp.stack([jnp.broadcast_to(dy, hbeg.shape),
                      jnp.broadcast_to(dx, wbeg.shape)], axis=-1)


def crop_or_padding_to_fixed_size(images: jnp.ndarray, masks: jnp.ndarray,
                                  hbeg: jnp.ndarray, wbeg: jnp.ndarray,
                                  out_h: int, out_w: int
                                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic core of augmentation.py:160-185 (batched).
    hbeg/wbeg: (B,) int32 crop begins (ignored on padding axes)."""
    off = fixed_size_offsets(images.shape[1], images.shape[2],
                             out_h, out_w, hbeg, wbeg)
    return (window_shift(images, off, out_h, out_w),
            window_shift(masks, off, out_h, out_w))


def crop_or_padding_to_fixed_size_instance(
        images: jnp.ndarray, masks: jnp.ndarray, keypoints: jnp.ndarray,
        hbeg: jnp.ndarray, wbeg: jnp.ndarray, out_h: int, out_w: int
        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic core of augmentation.py:118-158: same window rule,
    plus the keypoint shift kp -= (wbeg, hbeg) then += the pad begins
    (:140-153 — net kp -= offset).  keypoints: (B, K, 2) pixel coords."""
    off = fixed_size_offsets(images.shape[1], images.shape[2],
                             out_h, out_w, hbeg, wbeg)
    kp = keypoints - off[:, None, ::-1].astype(keypoints.dtype)
    return (window_shift(images, off, out_h, out_w),
            window_shift(masks, off, out_h, out_w), kp)


def instance_window_range(masks: jnp.ndarray, out_h: int, out_w: int,
                          overlap_ratio: float = 0.5
                          ) -> tuple[jnp.ndarray, ...]:
    """The sampled-window bounds of augmentation.py:118-134: the crop must
    keep at least ``overlap_ratio`` of the foreground bbox.  masks:
    (B, H, W) (nonzero = foreground).  Returns (hrmin, hrmax, wrmin,
    wrmax) each (B,) int32, with max clamped >= min+1 so
    randint(lo, hi) stays well-defined for degenerate/padding cases."""
    b, h, w = masks.shape
    fg = masks > 0
    ys = jnp.arange(h, dtype=jnp.int32)[None, :]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    any_y = fg.any(axis=2)
    any_x = fg.any(axis=1)
    big = jnp.int32(1 << 30)
    hmin = jnp.min(jnp.where(any_y, ys, big), axis=1)
    hmax = jnp.max(jnp.where(any_y, ys, -big), axis=1)
    wmin = jnp.min(jnp.where(any_x, xs, big), axis=1)
    wmax = jnp.max(jnp.where(any_x, xs, -big), axis=1)
    fh = (hmax - hmin).astype(jnp.float32)
    fw = (wmax - wmin).astype(jnp.float32)
    hrmax = jnp.minimum(hmin + overlap_ratio * fh, h - out_h).astype(jnp.int32)
    hrmin = jnp.maximum(hmin + overlap_ratio * fh - out_h, 0).astype(jnp.int32)
    wrmax = jnp.minimum(wmin + overlap_ratio * fw, w - out_w).astype(jnp.int32)
    wrmin = jnp.maximum(wmin + overlap_ratio * fw - out_w, 0).astype(jnp.int32)
    hrmax = jnp.maximum(hrmax, hrmin + 1)
    wrmax = jnp.maximum(wrmax, wrmin + 1)
    return hrmin, hrmax, wrmin, wrmax


def crop_or_padding(images: jnp.ndarray, masks: jnp.ndarray,
                    keypoints: jnp.ndarray, hratio: float, wratio: float
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """augmentation.py:75-116 ``crop_or_padding``: ratio < 1 centre-crops,
    ratio > 1 centre-pads; output is (int(hratio*H), int(wratio*W)) —
    static because the ratios are trace-time constants (the reference's
    ImageSizeBatchSampler picks one size per batch anyway,
    linemod_dataset.py:295-334).

    Keypoint parity note: the reference shifts keypoints by the FULL size
    delta (hd, wd), not the centre begin (:113-114) — reproduced
    verbatim, quirk and all.
    """
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    hd = int(hratio * h - h)
    wd = int(wratio * w - w)
    # crop begins -hd//2 inside the source; pad begins hd//2 in the output
    dy = -(hd // 2) if hd > 0 else (-hd) // 2
    dx = -(wd // 2) if wd > 0 else (-wd) // 2
    off = jnp.tile(jnp.asarray([[dy, dx]], jnp.int32), (b, 1))
    kp = keypoints - jnp.asarray([wd, hd], keypoints.dtype)
    return (window_shift(images, off, h + hd, w + wd),
            window_shift(masks, off, h + hd, w + wd), kp)


def crop_resize_instance_v1(images: jnp.ndarray, masks: jnp.ndarray,
                            keypoints: jnp.ndarray,
                            resize_ratio: jnp.ndarray,
                            hbeg: jnp.ndarray, wbeg: jnp.ndarray,
                            out_h: int, out_w: int
                            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic core of augmentation.py:250-279: crop (or centre-pad)
    a window of (int(out_h*r), int(out_w*r)) at (hbeg, wbeg), then resize
    it to (out_h, out_w) — fused into one separable resample per sample.

    resize_ratio/hbeg/wbeg: (B,) — per-sample sampled parameters.  The
    intermediate window size uses the reference's int() truncation.
    Image: cv2 INTER_LINEAR half-pixel rule, sampled on the window then
    shifted to source (window pixels outside the source are zero — the
    np.zeros pad of :143-156); the resize edge-clamp replicates window
    edges (cv2 clamps to the intermediate image).  Mask: cv2
    INTER_NEAREST floor rule ``src = floor(dst * in/out)``.
    Keypoints: (kp - beg + padbeg) / r (:140-153,276-277).
    """
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    th = jnp.trunc(out_h * resize_ratio).astype(jnp.int32)
    tw = jnp.trunc(out_w * resize_ratio).astype(jnp.int32)
    off = fixed_size_offsets_dynamic(h, w, th, tw, hbeg, wbeg)

    thf = th.astype(jnp.float32)[:, None]
    twf = tw.astype(jnp.float32)[:, None]
    gy = jnp.arange(out_h, dtype=jnp.float32)[None, :]
    gx = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    # window coords, cv2-resize half-pixel, clamped to the window (edge
    # replication inside the intermediate image)
    wy = jnp.clip((gy + 0.5) * (thf / out_h) - 0.5, 0.0, thf - 1.0)
    wx = jnp.clip((gx + 0.5) * (twf / out_w) - 0.5, 0.0, twf - 1.0)
    sy = wy + off[:, 0:1].astype(jnp.float32)
    sx = wx + off[:, 1:2].astype(jnp.float32)
    img = _apply_separable(images, _tent_matrix(sy, h), _tent_matrix(sx, w))

    ny = jnp.floor(gy * (thf / out_h)).astype(jnp.int32)
    nx = jnp.floor(gx * (twf / out_w)).astype(jnp.int32)
    ny = jnp.minimum(ny, th[:, None] - 1) + off[:, 0:1]
    nx = jnp.minimum(nx, tw[:, None] - 1) + off[:, 1:2]
    msk = _apply_separable(masks,
                           _nearest_matrix(ny, (ny >= 0) & (ny < h), h),
                           _nearest_matrix(nx, (nx >= 0) & (nx < w), w))

    r = resize_ratio[:, None, None].astype(keypoints.dtype)
    kp = (keypoints - off[:, None, ::-1].astype(keypoints.dtype)) / r
    return img, msk, kp


def fixed_size_offsets_dynamic(in_h: int, in_w: int,
                               th: jnp.ndarray, tw: jnp.ndarray,
                               hbeg: jnp.ndarray, wbeg: jnp.ndarray
                               ) -> jnp.ndarray:
    """fixed_size_offsets with per-sample (traced) target sizes."""
    dy = jnp.where(th >= in_h, -((th - in_h) // 2), hbeg)
    dx = jnp.where(tw >= in_w, -((tw - in_w) // 2), wbeg)
    return jnp.stack([dy, dx], axis=-1).astype(jnp.int32)


def crop_resize_instance_v2(images: jnp.ndarray, masks: jnp.ndarray,
                            keypoints: jnp.ndarray,
                            resize_ratio: jnp.ndarray,
                            do_resize: jnp.ndarray,
                            hbeg: jnp.ndarray, wbeg: jnp.ndarray,
                            out_h: int, out_w: int
                            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic core of augmentation.py:281-313: (optionally) resize
    the WHOLE image by r — sized to keep the instance within the
    configured extent box — then crop/centre-pad to (out_h, out_w); both
    stages fused into one separable resample.

    do_resize: (B,) bool (the reference's 80%% coin, :297); hbeg/wbeg are
    begins in the RESIZED image's coordinate frame.
    Image taps: resize edge-clamp is to the resized image's extent, then
    the crop window zero-pads outside it.  Mask: nearest floor rule
    composed with the integer crop.  Keypoints: kp*r - beg + padbeg.
    """
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    r = jnp.where(do_resize, resize_ratio, 1.0)
    rh = jnp.trunc(h * r).astype(jnp.int32)    # resized extents, int()
    rw = jnp.trunc(w * r).astype(jnp.int32)
    # the crop/pad stage's INPUT is the resized image (rh, rw) and its
    # target is (out_h, out_w) — pad iff out >= resized
    off = fixed_size_offsets_dynamic(rh, rw, out_h, out_w, hbeg, wbeg)

    rhf = rh.astype(jnp.float32)[:, None]
    rwf = rw.astype(jnp.float32)[:, None]
    gy = jnp.arange(out_h, dtype=jnp.float32)[None, :]
    gx = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    # coords in the resized image; outside its extent -> zero pad
    iy = gy + off[:, 0:1].astype(jnp.float32)
    ix = gx + off[:, 1:2].astype(jnp.float32)
    vy = (iy >= 0) & (iy <= rhf - 1)
    vx = (ix >= 0) & (ix <= rwf - 1)
    # resized -> source, cv2 half-pixel + source edge clamp
    sy = jnp.clip((iy + 0.5) * (h / rhf) - 0.5, 0.0, h - 1.0)
    sx = jnp.clip((ix + 0.5) * (w / rwf) - 0.5, 0.0, w - 1.0)
    Wy = _tent_matrix(sy, h) * vy[..., None]
    Wx = _tent_matrix(sx, w) * vx[..., None]
    img = _apply_separable(images, Wy, Wx)

    ny = jnp.floor((gy + off[:, 0:1].astype(jnp.float32)) * (h / rhf))
    nx = jnp.floor((gx + off[:, 1:2].astype(jnp.float32)) * (w / rwf))
    msk = _apply_separable(
        masks,
        _nearest_matrix(ny.astype(jnp.int32), vy & (ny >= 0) & (ny < h), h),
        _nearest_matrix(nx.astype(jnp.int32), vx & (nx >= 0) & (nx < w), w))

    rk = r[:, None, None].astype(keypoints.dtype)
    kp = keypoints * rk - off[:, None, ::-1].astype(keypoints.dtype)
    return img, msk, kp


def compute_resize_range(masks: jnp.ndarray, hmin: float, hmax: float,
                         wmin: float, wmax: float
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """augmentation.py:235-247: per-sample [rmin, rmax] keeping the
    foreground extent within the configured pixel box.  masks: (B, H, W).
    Empty masks fall back to [1, 1]."""
    b, h, w = masks.shape
    fg = masks > 0
    ys = jnp.arange(h, dtype=jnp.float32)[None, :]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    any_y = fg.any(axis=2)
    any_x = fg.any(axis=1)
    big = jnp.float32(1 << 30)
    ylen = (jnp.max(jnp.where(any_y, ys, -big), axis=1)
            - jnp.min(jnp.where(any_y, ys, big), axis=1))
    xlen = (jnp.max(jnp.where(any_x, xs, -big), axis=1)
            - jnp.min(jnp.where(any_x, xs, big), axis=1))
    ok = any_y.any(axis=1) & (xlen > 0) & (ylen > 0)
    xlen = jnp.maximum(xlen, 1.0)
    ylen = jnp.maximum(ylen, 1.0)
    rmin = jnp.maximum(wmin / xlen, hmin / ylen)
    rmax = jnp.minimum(wmax / xlen, hmax / ylen)
    return jnp.where(ok, rmin, 1.0), jnp.where(ok, rmax, 1.0)


def add_gaussian_noise(images: jnp.ndarray, noise: jnp.ndarray
                       ) -> jnp.ndarray:
    """augmentation.py:212-221 gaussian branch: one (B, H, W) noise field
    repeated across channels, clipped, uint8-truncated."""
    if images.ndim == 4:
        noise = noise[..., None]
    out = jnp.clip(images.astype(jnp.float32) + noise, 0.0, 255.0)
    return jnp.trunc(out)     # .astype(np.uint8) truncation, values >= 0


def motion_blur(images: jnp.ndarray, sizes: jnp.ndarray,
                horizontal: jnp.ndarray, max_size: int = 15) -> jnp.ndarray:
    """augmentation.py:222-232 motion-blur branch, batched: per-sample box
    kernel of odd ``sizes`` (<= max_size) along x (horizontal) or y,
    cv2.filter2D default BORDER_REFLECT_101 edges.  Grouped conv with one
    group per sample so every image gets its own kernel."""
    squeeze = images.ndim == 3
    if squeeze:
        imgs = images[:, None]                        # (B, 1, H, W)
    else:
        imgs = jnp.moveaxis(images, -1, 1)
    b, c, h, w = imgs.shape
    half = max_size // 2
    taps = jnp.arange(max_size, dtype=jnp.float32) - half
    win = (jnp.abs(taps)[None, :]
           <= ((sizes.astype(jnp.float32) - 1.0) / 2.0)[:, None])
    k1d = win.astype(jnp.float32) / sizes.astype(jnp.float32)[:, None]
    kx = k1d[:, None, None, :]                        # (B, 1, 1, T)
    ky = k1d[:, None, :, None]                        # (B, 1, T, 1)
    kernel = jnp.where(horizontal[:, None, None, None],
                       kx * (taps[:, None] == 0.0),
                       ky * (taps[None, :] == 0.0))   # (B, 1, T, T)
    flat = imgs.reshape(1, b * c, h, w)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (half, half), (half, half)),
                   mode='reflect')
    kernel = jnp.repeat(kernel, c, axis=0)            # (B*C, 1, T, T)
    out = jax.lax.conv_general_dilated(
        flat, kernel, (1, 1), 'VALID',
        feature_group_count=b * c,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    out = out.reshape(b, c, h, w)
    # cv2.filter2D on uint8 rounds to nearest
    out = jnp.round(out)
    return out[:, 0] if squeeze else jnp.moveaxis(out, 1, -1)


def random_add_noise(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """augmentation.py:207-233 ``add_noise``: 90%% gaussian (var
    U[0, 0.3]*256), else motion blur (size from {3,5,7,9,11,15},
    horizontal or vertical coin) — per-sample, batched."""
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    kb, kv, kn, ks, kd = jax.random.split(key, 5)
    gaussian = jax.random.uniform(kb, (b,)) < 0.9
    var = jax.random.uniform(kv, (b,)) * 0.3 * 256.0
    sigma = jnp.sqrt(var)
    noise = sigma[:, None, None] * jax.random.normal(kn, (b, h, w))
    noisy = add_gaussian_noise(images, noise)
    sizes_tbl = jnp.asarray([3, 5, 7, 9, 11, 15], jnp.int32)
    sizes = sizes_tbl[jax.random.randint(ks, (b,), 0, 6)]
    horiz = jax.random.bernoulli(kd, 0.5, (b,))
    blurred = motion_blur(images.astype(jnp.float32), sizes, horiz)
    sel = gaussian.reshape((b,) + (1,) * (images.ndim - 1))
    return jnp.where(sel, noisy, blurred)


def perturb_capture(key: jax.Array, images: jnp.ndarray,
                    gain_range: tuple[float, float] = (0.6, 1.4),
                    offset_range: tuple[float, float] = (-25.0, 25.0)
                    ) -> jnp.ndarray:
    """Capture-condition perturbation on [0, 255] imagery (B, H, W[, C]):
    per-sample exposure shift (gain x offset) followed by the reference
    augmentation library's gaussian-noise-or-motion-blur coin
    (:func:`random_add_noise`, the batched augmentation.py:207-233 port).

    Shared by detector robustness training/eval (cli/train_detector
    --augment), keypoint-net photometric augmentation (cli/train
    --augment-photo) and the perturbed keypoint eval (cli/eval_synthetic
    --perturb): the same transform is the training regularizer AND the
    robustness probe, so augmented-vs-clean comparisons are apples to
    apples.
    """
    kg, ko, kn = jax.random.split(key, 3)
    b = images.shape[0]
    ax = (b,) + (1,) * (images.ndim - 1)
    gain = jax.random.uniform(kg, ax, minval=gain_range[0],
                              maxval=gain_range[1])
    off = jax.random.uniform(ko, ax, minval=offset_range[0],
                             maxval=offset_range[1])
    f = jnp.clip(images.astype(jnp.float32) * gain + off, 0.0, 255.0)
    return random_add_noise(kn, f)


def random_crop_resize_v2(key: jax.Array, images: jnp.ndarray,
                          masks: jnp.ndarray, keypoints: jnp.ndarray,
                          out_h: int, out_w: int,
                          overlap_ratio: float = 0.5,
                          hmin: float = 30.0, hmax: float = 135.0,
                          wmin: float = 30.0, wmax: float = 130.0
                          ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random wrapper over :func:`crop_resize_instance_v2` mirroring the
    reference's sampling (augmentation.py:281-313): 80%% resize coin, r
    from compute_resize_range, instance-overlapping window begins.  The
    window range is computed from the SOURCE mask bbox scaled by r (the
    reference recomputes it on the nearest-resized mask — identical up to
    one pixel of nearest-resize quantization)."""
    b, h, w = masks.shape
    kc, kr, kh, kw = jax.random.split(key, 4)
    do = jax.random.uniform(kc, (b,)) < 0.8
    rlo, rhi = compute_resize_range(masks, hmin, hmax, wmin, wmax)
    r = jnp.where(do, jax.random.uniform(kr, (b,)) * (rhi - rlo) + rlo, 1.0)

    # instance window bounds in the resized frame (scale the source bbox)
    fg = masks > 0
    ys = jnp.arange(h, dtype=jnp.float32)[None, :]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    any_y = fg.any(axis=2)
    any_x = fg.any(axis=1)
    big = jnp.float32(1 << 30)
    hmin_i = jnp.min(jnp.where(any_y, ys, big), axis=1) * r
    hmax_i = jnp.max(jnp.where(any_y, ys, -big), axis=1) * r
    wmin_i = jnp.min(jnp.where(any_x, xs, big), axis=1) * r
    wmax_i = jnp.max(jnp.where(any_x, xs, -big), axis=1) * r
    rh = jnp.trunc(h * r)
    rw = jnp.trunc(w * r)
    fh = hmax_i - hmin_i
    fw = wmax_i - wmin_i
    hrmax = jnp.minimum(hmin_i + overlap_ratio * fh, rh - out_h)
    hrmin = jnp.maximum(hmin_i + overlap_ratio * fh - out_h, 0.0)
    wrmax = jnp.minimum(wmin_i + overlap_ratio * fw, rw - out_w)
    wrmin = jnp.maximum(wmin_i + overlap_ratio * fw - out_w, 0.0)
    hrmax = jnp.maximum(hrmax, hrmin + 1.0)
    wrmax = jnp.maximum(wrmax, wrmin + 1.0)
    uh = jax.random.uniform(kh, (b,))
    uw = jax.random.uniform(kw, (b,))
    hbeg = jnp.trunc(hrmin + uh * (hrmax - hrmin)).astype(jnp.int32)
    wbeg = jnp.trunc(wrmin + uw * (wrmax - wrmin)).astype(jnp.int32)
    return crop_resize_instance_v2(images, masks, keypoints, r, do,
                                   hbeg, wbeg, out_h, out_w)
