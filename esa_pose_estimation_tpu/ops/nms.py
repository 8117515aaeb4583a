"""Batched on-device non-maximum suppression.

The reference runs YOLOv5 via torch.hub offline (reference:
simple_detect.py:5-19) and ships its NMS'd boxes in pickles.  A TPU-native
serving pipeline needs NMS on device so detect -> crop -> keypoint runs
without host round-trips.

Design: fixed-size, mask-based greedy NMS.  Boxes are pre-sorted by score;
suppression is a sequential scan over the sorted list (greedy NMS is
inherently ordered) with all IoU tests vectorized per step — O(D) scan
steps of O(D) vector work, static shapes throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. boxes: (..., N, 4) / (..., M, 4) as [x1, y1, x2, y2]
    -> (..., N, M)."""
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(boxes_a[..., 2] - boxes_a[..., 0], 0.0) * \
        jnp.maximum(boxes_a[..., 3] - boxes_a[..., 1], 0.0)
    area_b = jnp.maximum(boxes_b[..., 2] - boxes_b[..., 0], 0.0) * \
        jnp.maximum(boxes_b[..., 3] - boxes_b[..., 1], 0.0)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=('max_outputs',))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float = 0.45,
                score_threshold: float = 0.25,
                max_outputs: int = 16
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a (possibly batched) fixed-size candidate set.

    boxes: (..., N, 4); scores: (..., N).
    Returns (boxes (..., max_outputs, 4), scores (..., max_outputs),
    valid (..., max_outputs) bool), score-sorted; suppressed/overflow slots
    have score 0 and valid False.
    """
    n = boxes.shape[-2]
    order = jnp.argsort(-scores, axis=-1)
    boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=-2)
    scores_s = jnp.take_along_axis(scores, order, axis=-1)

    iou = iou_matrix(boxes_s, boxes_s)                       # (..., N, N)
    alive0 = scores_s > score_threshold

    def body(i, alive):
        keep_i = alive[..., i]
        suppress = (iou[..., i, :] > iou_threshold) & keep_i[..., None]
        idx = jnp.arange(n) > i
        return alive & ~(suppress & idx)

    alive = jax.lax.fori_loop(0, n, body, alive0)

    kept_scores = jnp.where(alive, scores_s, 0.0)
    k = min(max_outputs, n)
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    top_boxes = jnp.take_along_axis(boxes_s, top_idx[..., None], axis=-2)
    if k < max_outputs:
        pad = max_outputs - k
        top_scores = jnp.concatenate(
            [top_scores, jnp.zeros(top_scores.shape[:-1] + (pad,),
                                   top_scores.dtype)], axis=-1)
        top_boxes = jnp.concatenate(
            [top_boxes, jnp.zeros(top_boxes.shape[:-2] + (pad, 4),
                                  top_boxes.dtype)], axis=-2)
    valid = top_scores > score_threshold
    return top_boxes, top_scores, valid
