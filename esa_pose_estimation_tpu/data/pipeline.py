"""Device-side input pipeline: raw frames + boxes -> model-ready batches.

The batched, fused equivalent of ``ESADataSet.__getitem__`` (reference:
data_load4.py:103-203, call stack SURVEY §3.4): square crop x1.05 ->
resize -> keypoints to crop space -> Gaussian heatmap + weight targets ->
color jitter (train) -> normalize.  One jitted program per batch instead
of per-sample CPU work in DataLoader forks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.data.augment import color_jitter
from esa_pose_estimation_tpu.ops import crop as crop_ops
from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops


@partial(jax.jit, static_argnames=('crop_size', 'train'))
def build_batch(frames: jnp.ndarray, bboxes: jnp.ndarray,
                keypoints_2d: jnp.ndarray, key: jax.Array,
                crop_size: int = 128, sigma: float = 2.0,
                train: bool = True, norm_mean: float = 0.449,
                norm_std: float = 0.229) -> dict[str, jnp.ndarray]:
    """frames (B, H, W) [0,255]; bboxes (B, 4); keypoints_2d (B, K, 2)
    full-frame -> {'image', 'heatmaps', 'weights', 'rate', 'origin',
    'keypoints_crop'} (NHWC).

    ``norm_mean/std``: 0.449/0.229 for the pure-synthetic split
    (data_load4.py:81), 0.5/0.229 for the mixed train+real_test split
    (data_load5.py:80-88), 0.485 for submission-time crops
    (data_load_val.py).
    """
    crops, rates, origins = crop_ops.crop_resize(frames, bboxes, crop_size)
    kp_crop = (keypoints_2d - origins[:, None, :].astype(jnp.float32)
               ) * rates[:, None, None]
    hm, wm = heatmap_ops.render_targets(kp_crop, crop_size, crop_size, sigma)
    if train:
        crops = color_jitter(key, crops)
    image = crop_ops.normalize(crops, norm_mean, norm_std)[..., None]
    return {
        'image': image,
        'heatmaps': jnp.transpose(hm, (0, 2, 3, 1)),
        'weights': jnp.transpose(wm, (0, 2, 3, 1)),
        'rate': rates,
        'origin': origins,
        'keypoints_crop': kp_crop,
    }
