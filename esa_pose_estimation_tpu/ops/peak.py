"""Heatmap peak decoding with log-Taylor sub-pixel refinement.

TPU-native replacement for the reference's CPU decode tail
(reference: inference.py:22-94 — ``get_max_preds`` argmax extraction plus the
per-keypoint Python loop over ``my_taylor``; consumed via ``get_final`` at
demo.py:191 / val.py:168).  The reference runs this one keypoint at a time on
the host; here the whole (B, K) batch decodes as one fused XLA program:
argmax over the flattened map, a 5-point log-derivative stencil gathered with
static shapes, and branch conditions expressed as ``where`` masks.

Semantics match ``my_taylor`` (inference.py:75-94) exactly:

* heatmap floored at 1e-10 before ``log`` (``get_final``, inference.py:141);
* offsets only applied when ``1 < px < W-2`` and ``1 < py < H-2``;
* offsets only applied when ``hxx != 0 and hyy != 0``;
* offsets only applied when ``offset_x < 1 and offset_y < 1`` (the reference
  checks the *signed* value, not the absolute value — reproduced here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_peaks(heatmaps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched argmax peak extraction.

    heatmaps: (..., H, W).  Returns (coords (..., 2) float32 as (x, y),
    maxvals (...,)).  Matches get_max_preds (inference.py:22-51) / the
    torch.max pair at demo.py:173-186 (row-major flat argmax: x = idx % W).
    Computes in float32 regardless of input dtype (parity with the Pallas
    kernel, which upcasts; keeps bf16 serving tails threshold-stable).
    """
    heatmaps = heatmaps.astype(jnp.float32)
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), maxvals


def _gather_log(flat_log: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                dy: int, dx: int, h: int, w: int) -> jnp.ndarray:
    """Gather log-heatmap values at (py+dy, px+dx), indices clipped to bounds.

    flat_log: (..., H*W); py/px: (...,) int32.  Clipping is safe because the
    stencil result is masked out at borders anyway.
    """
    yy = jnp.clip(py + dy, 0, h - 1)
    xx = jnp.clip(px + dx, 0, w - 1)
    return jnp.take_along_axis(flat_log, (yy * w + xx)[..., None],
                               axis=-1)[..., 0]


def _taylor_offset(g, px: jnp.ndarray, py: jnp.ndarray, h: int, w: int
                   ) -> jnp.ndarray:
    """Shared my_taylor stencil: 5-point log-derivatives + gating.

    ``g(dy, dx)`` gathers the log-heatmap at (py+dy, px+dx) — the only
    thing that differs between the NCHW and NHWC layouts.  Returns the
    gated (..., 2) subpixel offset to add to the integer peak.
    """
    c = g(0, 0)
    hx = 0.5 * (g(0, 1) - g(0, -1))
    hy = 0.5 * (g(1, 0) - g(-1, 0))
    hxx = 0.25 * (g(0, 2) - 2.0 * c + g(0, -2))
    hyy = 0.25 * (g(2, 0) - 2.0 * c + g(-2, 0))

    interior = ((px > 1) & (px < w - 2) & (py > 1) & (py < h - 2))
    nonzero = (hxx != 0.0) & (hyy != 0.0)
    safe_hxx = jnp.where(hxx == 0.0, 1.0, hxx)
    safe_hyy = jnp.where(hyy == 0.0, 1.0, hyy)
    off_x = -hx / safe_hxx
    off_y = -hy / safe_hyy
    # Reference gates on the signed offsets being < 1 (inference.py:92).
    in_range = (off_x < 1.0) & (off_y < 1.0)
    apply = interior & nonzero & in_range
    offset = jnp.stack([off_x, off_y], axis=-1)
    return jnp.where(apply[..., None], offset, 0.0)


def taylor_refine(heatmaps: jnp.ndarray, coords: jnp.ndarray,
                  eps: float = 1e-10) -> jnp.ndarray:
    """Log-Taylor sub-pixel refinement (vectorized ``my_taylor``).

    heatmaps: (..., H, W); coords: (..., 2) float (x, y) at integer peaks.
    Returns refined coords (..., 2).  Runs in float32 (see argmax_peaks).
    """
    heatmaps = heatmaps.astype(jnp.float32)
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    log_hm = jnp.log(jnp.maximum(heatmaps, eps))
    flat = log_hm.reshape(log_hm.shape[:-2] + (h * w,))
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    def g(dy, dx):
        return _gather_log(flat, py, px, dy, dx, h, w)

    return coords + _taylor_offset(g, px, py, h, w)


def decode_heatmaps(heatmaps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused argmax + log-Taylor decode.

    heatmaps: (..., H, W) -> (coords (..., 2), maxvals (...,)).
    One XLA program replacing the reference's GPU->CPU sync + Python loop
    (demo.py:173-191).
    """
    coords, maxvals = argmax_peaks(heatmaps)
    return taylor_refine(heatmaps, coords), maxvals


def decode_heatmaps_auto(heatmaps: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode via the Pallas kernel on TPU (bit-identical, ~1.4x faster),
    the XLA path elsewhere."""
    if jax.default_backend() == 'tpu':
        from esa_pose_estimation_tpu.ops.pallas.peak_decode import (
            decode_heatmaps_pallas,
        )
        return decode_heatmaps_pallas(heatmaps, interpret=False)
    return decode_heatmaps(heatmaps)


# Decode dispatch for channels-last model output: True = the gather-based
# NHWC path (experimental/nhwc_decode.py — measured 2631 vs 3024 img/s,
# a quarantined negative result), False = transpose + NCHW Pallas kernel
# on TPU (production default).
#
# TRACE-TIME flag: jitted callers bake the chosen path into their compiled
# executable and jax does not key its cache on this global — flip it
# BEFORE building/first-calling a jitted pipeline (as the bench does), not
# between calls to an already-compiled one (silently a no-op there).
NHWC_DECODE: bool = False


def decode_heatmaps_auto_nhwc(heatmaps: jnp.ndarray
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode channels-last model output, choosing the layout strategy.

    The serving tail receives NHWC maps straight from the conv head; the
    two candidate programs are (a) transpose to NCHW + the Pallas/row
    decode (default), (b) the native NHWC reduce+gather decode
    (experimental/nhwc_decode.py).  ``NHWC_DECODE`` picks (module-level
    so tests and the bench can force either).
    """
    if NHWC_DECODE:
        from esa_pose_estimation_tpu.experimental.nhwc_decode import (
            decode_heatmaps_nhwc,
        )
        return decode_heatmaps_nhwc(heatmaps)
    nchw = jnp.moveaxis(heatmaps, -1, -3)
    return decode_heatmaps_auto(nchw)


def gaussian_modulate(heatmaps: jnp.ndarray, kernel: int = 11) -> jnp.ndarray:
    """Max-preserving Gaussian blur (vectorized ``gaussian_blur``,
    reference inference.py:96-110).

    cv2.GaussianBlur(k, k, sigma=0) uses sigma = 0.3*((k-1)*0.5 - 1) + 0.8
    with zero padding of ``border=(k-1)//2`` — reproduced with a separable
    depthwise convolution; each map is rescaled so its max is unchanged.
    """
    sigma = 0.3 * ((kernel - 1) * 0.5 - 1.0) + 0.8
    half = (kernel - 1) // 2
    x = jnp.arange(kernel, dtype=heatmaps.dtype) - half
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()

    batch = heatmaps.shape[:-2]
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape((-1, h, w))
    orig_max = jnp.max(flat, axis=(-2, -1), keepdims=True)

    # separable blur with zero padding (matches the dr-buffer zero border)
    def conv1d(arr, vertical):
        kh, kw = (kernel, 1) if vertical else (1, kernel)
        pad = [(half, half), (0, 0)] if vertical else [(0, 0), (half, half)]
        return jax.lax.conv_general_dilated(
            arr[:, None], g.reshape(1, 1, kh, kw),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))[:, 0]

    blurred = conv1d(conv1d(flat, True), False)
    new_max = jnp.maximum(jnp.max(blurred, axis=(-2, -1), keepdims=True),
                          1e-12)
    out = blurred * (orig_max / new_max)
    return out.reshape(batch + (h, w))


def taylor_refine_hessian(heatmaps: jnp.ndarray, coords: jnp.ndarray,
                          eps: float = 1e-10) -> jnp.ndarray:
    """Full 2x2-Hessian sub-pixel refinement on the log heatmap (vectorized
    ``taylor``, reference inference.py:54-73, used by get_final2 /
    get_final_preds after gaussian blur + log).

    heatmaps: (..., H, W) RAW maps (log applied here); coords (..., 2).
    """
    h, w = heatmaps.shape[-2:]
    log_hm = jnp.log(jnp.maximum(heatmaps, eps))
    flat = log_hm.reshape(log_hm.shape[:-2] + (h * w,))
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    def g(dy, dx):
        return _gather_log(flat, py, px, dy, dx, h, w)

    c = g(0, 0)
    dx = 0.5 * (g(0, 1) - g(0, -1))
    dy = 0.5 * (g(1, 0) - g(-1, 0))
    dxx = 0.25 * (g(0, 2) - 2.0 * c + g(0, -2))
    dxy = 0.25 * (g(1, 1) - g(-1, 1) - g(1, -1) + g(-1, -1))
    dyy = 0.25 * (g(2, 0) - 2.0 * c + g(-2, 0))

    det = dxx * dyy - dxy * dxy
    interior = ((px > 1) & (px < w - 2) & (py > 1) & (py < h - 2))
    apply = interior & (det != 0.0)
    safe_det = jnp.where(det == 0.0, 1.0, det)
    # offset = -H^-1 g with H = [[dxx, dxy], [dxy, dyy]]
    off_x = -(dyy * dx - dxy * dy) / safe_det
    off_y = -(-dxy * dx + dxx * dy) / safe_det
    offset = jnp.stack([off_x, off_y], axis=-1)
    return coords + jnp.where(apply[..., None], offset, 0.0)


def decode_heatmaps_dark(heatmaps: jnp.ndarray, kernel: int = 11
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DARK-style decode: blur modulation + full-Hessian log-Taylor
    (the reference ``get_final2`` path, inference.py:154-170)."""
    coords, maxvals = argmax_peaks(heatmaps)
    modulated = gaussian_modulate(heatmaps, kernel)
    return taylor_refine_hessian(modulated, coords), maxvals


def select_confident(maxvals: jnp.ndarray, threshold: float = 0.6,
                     min_count: int = 0) -> jnp.ndarray:
    """Keypoint selection mask replicating the top-``large_k`` semantics.

    The reference computes ``large_k = #(maxvals > threshold)`` (optionally
    floored at ``min_count``, val.py:172-175) then takes the ``large_k``
    most-confident keypoints — which is exactly {i : maxval_i > threshold}
    plus, if needed, the highest-confidence remainder up to ``min_count``.
    Returns a boolean mask with static shape (jit-friendly: downstream
    solvers consume masks/weights instead of gathered subsets).

    maxvals: (..., K) -> mask (..., K) bool.
    """
    above = maxvals > threshold
    if min_count <= 0:
        return above
    k = maxvals.shape[-1]
    order = jnp.argsort(-maxvals, axis=-1)
    rank = jnp.argsort(order, axis=-1)  # rank[i] = position of i in descending sort
    return above | (rank < min(min_count, k))
