"""Channels-last peak decode (measured-negative experiment).

The serving tail receives NHWC heatmaps straight from the conv head; the
production path transposes to NCHW and runs the row-major Pallas/XLA
decode (ops/peak.py).  This module is the alternative that skips the
transpose: argmax + log-Taylor run directly over the sublane (H*W) axis
with K in the vector lanes, via reduce + take_along_axis gathers.

Semantics are identical to :func:`ops.peak.decode_heatmaps` (same
row-major flat-argmax tie-breaking, f32 internally so bf16 inputs give
bit-identical coords/maxvals from either arm) — but measured SLOWER end
to end on a v5e chip: 2631 vs 3024 img/s serving throughput.  The gather
addressing costs more than the one bandwidth-bound HBM layout copy it
avoids.  Opt-in via ``ops.peak.NHWC_DECODE``; quarantined per the
documented-negative-result standard (QUALITY.md §3).
"""

from __future__ import annotations

import jax.numpy as jnp

from esa_pose_estimation_tpu.ops.peak import _taylor_offset


def argmax_peaks_nhwc(heatmaps: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Channels-last argmax peaks: (..., H, W, K) -> ((..., K, 2), (..., K)).

    Same row-major flat-argmax semantics as ``ops.peak.argmax_peaks``,
    but the reduction runs over the sublane (H*W) axis with K in the
    vector lanes — no layout transpose of the model's NHWC output.
    Upcasts to float32 first (like the Pallas kernel) so a bf16 serving
    tail gets identical maxvals/coords from either dispatch arm.
    """
    heatmaps = heatmaps.astype(jnp.float32)
    h, w, k = heatmaps.shape[-3:]
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w, k))
    idx = jnp.argmax(flat, axis=-2)
    maxvals = jnp.max(flat, axis=-2)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), maxvals


def taylor_refine_nhwc(heatmaps: jnp.ndarray, coords: jnp.ndarray,
                       eps: float = 1e-10) -> jnp.ndarray:
    """Log-Taylor refinement on channels-last maps (semantics of
    ``ops.peak.taylor_refine``, layout of the model output).

    heatmaps: (..., H, W, K); coords: (..., K, 2) float (x, y).  Runs in
    float32 regardless of input dtype (parity with the Pallas kernel).
    """
    heatmaps = heatmaps.astype(jnp.float32)
    h, w, k = heatmaps.shape[-3:]
    log_hm = jnp.log(jnp.maximum(heatmaps, eps))
    flat = log_hm.reshape(log_hm.shape[:-3] + (h * w, k))
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    def g(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None, :],
                                   axis=-2)[..., 0, :]

    return coords + _taylor_offset(g, px, py, h, w)


def decode_heatmaps_nhwc(heatmaps: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused argmax + log-Taylor decode on (..., H, W, K) maps."""
    coords, maxvals = argmax_peaks_nhwc(heatmaps)
    return taylor_refine_nhwc(heatmaps, coords), maxvals
