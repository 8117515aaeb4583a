"""Single-class spacecraft detector (anchor-free, center-heatmap style).

Fills the role of the reference's offline YOLOv5s stage (reference:
simple_detect.py:5-19 pulls ``yolov5s`` from torch.hub, runs it once, and
stores the boxes in the dataset pickles consumed as ``des['bbox']``,
data_load4.py:110).  Instead of shipping a torch-hub dependency, the
framework provides a compact TPU-native detector that runs in the serving
graph, so detect -> crop -> keypoint is one jitted program.

Architecture: strided conv backbone to stride 8/16, an objectness heatmap
head and a box-geometry head (center offset + log size), CenterNet-style
decoding with max-pool peak NMS + batched box NMS.  Purposely small — the
SPEED frames contain one spacecraft on a mostly empty background, and the
reference itself used an off-the-shelf COCO model without fine-tuning.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from esa_pose_estimation_tpu.models.layers import ConvBN
from esa_pose_estimation_tpu.ops.nms import batched_nms

Dtype = Any


class TinyDetector(nn.Module):
    """Input (B, H, W, C) -> dict of feature maps at ``stride``:

    * ``heatmap``: (B, H/s, W/s, 1) objectness logits;
    * ``offset``: (B, H/s, W/s, 2) sub-cell center offset in [0, 1];
    * ``size``: (B, H/s, W/s, 2) log box size in stride units.
    """
    width: int = 32
    stride: int = 16
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # faster-adapting BN (0.9) than the keypoint nets: the detector
        # trains briefly and must eval with converged running stats
        kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                  bn_momentum=0.9)
        w = self.width
        x = x.astype(self.dtype)
        n_down = {8: 3, 16: 4, 32: 5}[self.stride]
        for i in range(n_down):
            x = ConvBN(min(w * (2 ** i), 256), 3, 2, **kw)(x, train)
            x = ConvBN(min(w * (2 ** i), 256), 3, 1, **kw)(x, train)
        feat = ConvBN(256, 3, 1, **kw)(x, train)
        heatmap = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.0),
                          name='heatmap_head')(feat)
        offset = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                         name='offset_head')(feat)
        size = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name='size_head')(feat)
        return {
            'heatmap': heatmap.astype(jnp.float32),
            'offset': nn.sigmoid(offset).astype(jnp.float32),
            'size': size.astype(jnp.float32),
        }


def decode_detections(outputs: dict[str, jnp.ndarray], stride: int,
                      top_k: int = 32, iou_threshold: float = 0.45,
                      score_threshold: float = 0.25, max_outputs: int = 8
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Heatmap peaks -> boxes -> NMS, fully batched.

    Returns (boxes (B, max_outputs, 4) [x1,y1,x2,y2] in input pixels,
    scores, valid mask).
    """
    logits = outputs['heatmap'][..., 0]                     # (B, Hs, Ws)
    b, hs, ws = logits.shape
    prob = jax.nn.sigmoid(logits)
    # 3x3 max-pool peak NMS (CenterNet trick): keep local maxima only.
    pooled = jax.lax.reduce_window(
        prob, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        padding=[(0, 0), (1, 1), (1, 1)])
    peaks = jnp.where(prob >= pooled, prob, 0.0).reshape(b, hs * ws)

    top_k = min(top_k, hs * ws)
    scores, idx = jax.lax.top_k(peaks, top_k)               # (B, top_k)
    cy = (idx // ws).astype(jnp.float32)
    cx = (idx % ws).astype(jnp.float32)

    flat = lambda a: a.reshape(b, hs * ws, a.shape[-1])  # noqa: E731
    off = jnp.take_along_axis(flat(outputs['offset']), idx[..., None], axis=1)
    size = jnp.take_along_axis(flat(outputs['size']), idx[..., None], axis=1)
    cxf = (cx + off[..., 0]) * stride
    cyf = (cy + off[..., 1]) * stride
    bw = jnp.exp(jnp.clip(size[..., 0], -8.0, 8.0)) * stride
    bh = jnp.exp(jnp.clip(size[..., 1], -8.0, 8.0)) * stride
    boxes = jnp.stack([cxf - bw / 2, cyf - bh / 2,
                       cxf + bw / 2, cyf + bh / 2], axis=-1)
    return batched_nms(boxes, scores, iou_threshold, score_threshold,
                       max_outputs)


def detection_targets(bboxes: jnp.ndarray, grid_hw: tuple[int, int],
                      stride: int, sigma_scale: float = 12.0
                      ) -> dict[str, jnp.ndarray]:
    """Render training targets for one box per image (SPEED has a single
    object).  bboxes: (B, 4) [x1,y1,x2,y2] pixels."""
    hs, ws = grid_hw
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2 / stride
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2 / stride
    bw = (bboxes[:, 2] - bboxes[:, 0]) / stride
    bh = (bboxes[:, 3] - bboxes[:, 1]) / stride
    xs = jnp.arange(ws, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(hs, dtype=jnp.float32)[None, :, None]
    sigma2 = jnp.maximum(bw * bh, 1.0)[:, None, None] / sigma_scale
    heat = jnp.exp(-((xs - cx[:, None, None]) ** 2
                     + (ys - cy[:, None, None]) ** 2) / (2 * sigma2))
    cell_x = jnp.floor(cx)
    cell_y = jnp.floor(cy)
    is_center = ((xs == cell_x[:, None, None])
                 & (ys == cell_y[:, None, None]))
    # the center cell is an exact positive (CenterNet convention): without
    # it the focal loss may see no positives at all and collapse the map.
    heat = jnp.maximum(heat, is_center.astype(heat.dtype))
    offset = jnp.stack(
        [jnp.broadcast_to((cx - cell_x)[:, None, None], heat.shape),
         jnp.broadcast_to((cy - cell_y)[:, None, None], heat.shape)],
        axis=-1)
    size = jnp.stack(
        [jnp.broadcast_to(jnp.log(jnp.maximum(bw, 1e-3))[:, None, None],
                          heat.shape),
         jnp.broadcast_to(jnp.log(jnp.maximum(bh, 1e-3))[:, None, None],
                          heat.shape)], axis=-1)
    return {'heatmap': heat[..., None], 'offset': offset, 'size': size,
            'center_mask': is_center[..., None].astype(jnp.float32)}


def detection_loss(outputs: dict[str, jnp.ndarray],
                   targets: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Penalty-reduced focal loss on the heatmap + L1 on offset/size at the
    center cell (CenterNet-style)."""
    prob = jax.nn.sigmoid(outputs['heatmap'])
    gt = targets['heatmap']
    pos = (gt >= 0.999).astype(jnp.float32)
    neg_w = (1.0 - gt) ** 4
    eps = 1e-6
    pos_loss = -jnp.log(prob + eps) * (1 - prob) ** 2 * pos
    neg_loss = -jnp.log(1 - prob + eps) * prob ** 2 * neg_w * (1 - pos)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    heat_loss = (pos_loss.sum() + neg_loss.sum()) / n_pos

    cm = targets['center_mask']
    reg_loss = (jnp.abs(outputs['offset'] - targets['offset']) * cm).sum() \
        / jnp.maximum(cm.sum(), 1.0)
    size_loss = (jnp.abs(outputs['size'] - targets['size']) * cm).sum() \
        / jnp.maximum(cm.sum(), 1.0)
    return heat_loss + reg_loss + 0.1 * size_loss


# ---------------------------------------------------------------------------
# Checkpoint-sidecar config
# ---------------------------------------------------------------------------

def save_detector_config(workdir: str, **cfg) -> None:
    """Write ``detector.json`` next to the checkpoint directory.

    The detector's downscale/stride/width are baked into its weights (a
    downscale-8 detector decodes garbage on downscale-4 inputs), so the
    training driver records them and the consumers (eval CLI, bench
    two-stage mode) read them back instead of trusting a flag to match.
    """
    import json
    import os
    with open(os.path.join(workdir, 'detector.json'), 'w') as f:
        json.dump(cfg, f, indent=1)


def load_detector_config(workdir: str) -> dict | None:
    """Read ``detector.json`` from a detector workdir; None if absent
    (pre-sidecar checkpoints fall back to caller defaults)."""
    import json
    import os
    path = os.path.join(workdir, 'detector.json')
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
