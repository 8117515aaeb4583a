"""Device-side input pipeline: raw frames + boxes -> model-ready batches.

The batched, fused equivalent of ``ESADataSet.__getitem__`` (reference:
data_load4.py:103-203, call stack SURVEY §3.4): square crop x1.05 ->
resize -> keypoints to crop space -> Gaussian heatmap + weight targets ->
color jitter (train) -> normalize.  One jitted program per batch instead
of per-sample CPU work in DataLoader forks.
"""

from __future__ import annotations

import collections
from functools import partial
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.data.augment import (affine_sample,
                                                  color_jitter,
                                                  _rotation_matrices)
from esa_pose_estimation_tpu.ops import crop as crop_ops
from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops


def augment_crop_geom(key: jax.Array, crops: jnp.ndarray,
                      kp_crop: jnp.ndarray, max_deg: float = 25.0
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time geometric augmentation on CROP-SPACE imagery+keypoints:
    per-sample horizontal flip (p=0.5, an exact slice) + in-plane
    rotation about the crop center (bilinear ``affine_sample``).

    The synthetic path applies the same transform pair analytically to
    its keypoints BEFORE rendering (synthetic.make_batch augment_geom —
    free and exact there, so it uses the full +-180 deg).  Real shard
    imagery only exists post-crop, so the rotation resamples pixels and
    is bounded (default +-25 deg) to keep corner loss and rotated-out
    keypoints rare; the flip is lossless either way.  The reference
    never geometric-augments the ESA path (data_load4.py:78-83 is color
    only) — the round-4 dress rehearsal measured WHY this matters: 480
    frames x 240 epochs memorized (train-split 0.0029 vs held-out 0.337
    SPEED score).

    crops (B, S, S) f32 [0,255]; kp_crop (B, K, 2) crop-space.
    """
    b, s = crops.shape[0], crops.shape[-1]
    kf, kr = jax.random.split(key)
    do = jax.random.bernoulli(kf, 0.5, (b,))
    crops = jnp.where(do[:, None, None], crops[:, :, ::-1], crops)
    kp_flip = kp_crop.at[..., 0].set((s - 1) - kp_crop[..., 0])
    kp_crop = jnp.where(do[:, None, None], kp_flip, kp_crop)
    ang = jax.random.uniform(kr, (b,), minval=-max_deg, maxval=max_deg)
    centers = jnp.full((b, 2), (s - 1) / 2.0, jnp.float32)
    crops = affine_sample(crops, _rotation_matrices(ang, centers))
    th = jnp.deg2rad(ang)
    c, sn = jnp.cos(th), jnp.sin(th)
    rel = kp_crop - centers[:, None, :]
    kp_crop = jnp.stack(
        [c[:, None] * rel[..., 0] - sn[:, None] * rel[..., 1],
         sn[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]],
        axis=-1) + centers[:, None, :]
    return crops, kp_crop


@partial(jax.jit, static_argnames=('crop_size', 'train', 'augment_geom',
                                   'augment_photo'))
def build_batch(frames: jnp.ndarray, bboxes: jnp.ndarray,
                keypoints_2d: jnp.ndarray, key: jax.Array,
                crop_size: int = 128, sigma: float = 2.0,
                train: bool = True, norm_mean: float = 0.449,
                norm_std: float = 0.229,
                augment_geom: bool = False,
                augment_photo: bool = False) -> dict[str, jnp.ndarray]:
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
    if train and augment_geom:
        crops, kp_crop = augment_crop_geom(
            jax.random.fold_in(key, 23), crops, kp_crop)
    hm, wm = heatmap_ops.render_targets(kp_crop, crop_size, crop_size, sigma)
    if train and augment_photo:
        from esa_pose_estimation_tpu.data.augment import perturb_capture
        crops = perturb_capture(jax.random.fold_in(key, 29), crops)
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


@partial(jax.jit, static_argnames=('train', 'augment_geom',
                                   'augment_photo'))
def build_batch_from_crops(crops: jnp.ndarray, rates: jnp.ndarray,
                           origins: jnp.ndarray, keypoints_2d: jnp.ndarray,
                           key: jax.Array, sigma: float = 2.0,
                           train: bool = True, norm_mean: float = 0.449,
                           norm_std: float = 0.229,
                           augment_geom: bool = False,
                           augment_photo: bool = False
                           ) -> dict[str, jnp.ndarray]:
    """Target build for HOST-cropped batches (the native loader's
    crop_size mode: its C++ workers already ran the detector-box ->
    square crop -> resize stage, shard_loader.cpp:153-254, the same stage
    the reference runs in its CPU DataLoader, data_load4.py:110-166).

    crops (B, S, S) f32 [0,255]; rates (B,); origins (B, 2);
    keypoints_2d (B, K, 2) full-frame.  Device work is only the target
    render + jitter + normalize — and the H2D leg shipped 65 KB crops
    instead of 2.3 MB frames, which is what makes ingest keep up with the
    chip on hosts whose link (not compute) is the bottleneck.
    """
    s = crops.shape[-1]
    kp_crop = (keypoints_2d - origins[:, None, :].astype(jnp.float32)
               ) * rates[:, None, None]
    if train and augment_geom:
        crops, kp_crop = augment_crop_geom(
            jax.random.fold_in(key, 23), crops, kp_crop)
    hm, wm = heatmap_ops.render_targets(kp_crop, s, s, sigma)
    if train and augment_photo:
        from esa_pose_estimation_tpu.data.augment import perturb_capture
        crops = perturb_capture(jax.random.fold_in(key, 29), crops)
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


def prefetch_to_device(batches: Iterable[dict[str, Any]],
                       sharding=None, size: int = 2
                       ) -> Iterator[dict[str, Any]]:
    """Double-buffered device staging: keep ``size`` batches' H2D
    transfers in flight ahead of the consumer.

    ``jax.device_put`` of a host numpy array enqueues an async copy; by
    issuing batch j+1's transfers while the device still computes on
    batch j, the link and the chip overlap instead of serializing (the
    role DataLoader prefetching + pinned-memory ``.cuda(non_blocking)``
    plays in the reference stack, main.py:273).  Non-array entries
    (e.g. the 'name' string list) pass through untouched.  With
    ``sharding`` (typically ``parallel.batch_sharding(mesh)``) arrays
    land pre-sharded, so the consuming jit does no relayout; in a
    multi-process run each host's batch becomes its block of the global
    batch (parallel/distributed.py:stage_global).
    """
    from esa_pose_estimation_tpu.parallel.distributed import stage_global

    buf: collections.deque = collections.deque()
    it = iter(batches)

    def put(v):
        if sharding is None:
            return jax.device_put(v)
        return stage_global(v, sharding)

    def stage(b: dict[str, Any]) -> dict[str, Any]:
        return {k: (put(v) if isinstance(v, np.ndarray) else v)
                for k, v in b.items()}

    try:
        for _ in range(size):
            buf.append(stage(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(stage(next(it)))
        except StopIteration:
            pass
        yield out
