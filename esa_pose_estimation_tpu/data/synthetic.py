"""Synthetic SPEED-like data generation.

The real SPEED dataset (12k 1920x1200 grayscale renders + poses) is not
shipped; this module generates statistically similar samples end-to-end on
device so training, evaluation, and benchmarking run without external data:

* a fixed 30-point "spacecraft" model (deterministic, like the reference's
  precomputed ``des['sift3d']`` keypoints from data/train.pkl,
  data_load4.py:90-101);
* random poses from the SPEED distribution (depth ~3..30 m, uniform
  rotation — cf. lib/utils/render_utils.py pose statistics);
* projected keypoints + rendered Gaussian-blob imagery standing in for the
  spacecraft appearance.

Everything is pure-JAX and jit/vmap friendly, so the synthetic pipeline
doubles as the load generator for throughput benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import camera
from esa_pose_estimation_tpu.ops import crop as crop_ops
from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops

NUM_KEYPOINTS = 30


def spacecraft_points(n: int = NUM_KEYPOINTS, extent: float = 0.45,
                      seed: int = 1234) -> jnp.ndarray:
    """Deterministic pseudo-spacecraft 3D keypoints (n, 3), metres."""
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, 3), minval=-extent, maxval=extent)
    # stretch one axis (solar panel-ish asymmetry)
    return pts * jnp.array([1.3, 1.0, 0.6])


class Sample(NamedTuple):
    image: jnp.ndarray        # (H, W) full-frame float32 [0, 255]
    bbox: jnp.ndarray         # (4,) [x1, y1, x2, y2]
    keypoints_2d: jnp.ndarray  # (K, 2) full-frame pixels
    quat: jnp.ndarray         # (4,) (w, x, y, z)
    trans: jnp.ndarray        # (3,)


def random_pose(key: jax.Array, min_depth: float = 5.0,
                max_depth: float = 30.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random quaternion + SPEED-plausible translation."""
    kq, kt, kd = jax.random.split(key, 3)
    q = jax.random.normal(kq, (4,))
    q = q / jnp.linalg.norm(q)
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    depth = jax.random.uniform(kd, (), minval=min_depth, maxval=max_depth)
    # keep the target roughly in frame: lateral offset proportional to depth
    lateral = jax.random.uniform(kt, (2,), minval=-0.16, maxval=0.16) * depth
    t = jnp.array([lateral[0], lateral[1], 0.0]) + jnp.array([0.0, 0.0, 1.0]) * depth
    return q, t


def _spot_params(n_kp: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-keypoint blob (sigma, amplitude) in full-frame pixels.

    Distinct appearance per keypoint — identical blobs make keypoint
    identity unlearnable (the network can only use constellation context,
    and distant/ambiguous views produce confident identity swaps that no
    robust solver can always reject).  Real spacecraft features are
    visually distinct; so are these.
    """
    k = jnp.arange(n_kp, dtype=jnp.float32)
    sigmas = 4.0 + 5.0 * (k % 5) / 4.0                     # 4..9 px
    amps = 0.45 + 0.55 * (((k * 7) % n_kp) / max(n_kp - 1, 1))
    return sigmas, amps


@partial(jax.jit, static_argnames=('height', 'width'))
def render_frame(keypoints_2d: jnp.ndarray, height: int = 1200,
                 width: int = 1920) -> jnp.ndarray:
    """Render a full frame as a sum of per-keypoint-distinct Gaussian blobs
    (a cheap stand-in for the spacecraft appearance whose local maxima sit
    exactly at the keypoints).

    Accumulates one keypoint at a time under ``lax.scan`` — materializing
    the (K, H, W) stack would cost K x frame bytes (17 GB for a batch of
    64 full frames) and OOM the chip.
    """
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    sigmas, amps = _spot_params(keypoints_2d.shape[-2])

    def body(acc, inp):
        kp, sig, amp = inp
        d2 = (xs - kp[0]) ** 2 + (ys - kp[1]) ** 2
        return acc + amp * jnp.exp(-d2 / (2.0 * sig * sig)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((height, width), jnp.float32),
                          (keypoints_2d, sigmas, amps))
    return jnp.clip(acc, 0.0, 1.0) * 255.0


def scaled_intrinsics(height: int, width: int) -> jnp.ndarray:
    """SPEED camera scaled to a non-native frame size (small-frame tests)."""
    K = jnp.asarray(camera.SPEED_K, jnp.float32)
    s = jnp.array([width / 1920.0, height / 1200.0, 1.0], jnp.float32)
    return K * s[:, None]


def make_sample(key: jax.Array, points_3d: jnp.ndarray,
                height: int = 1200, width: int = 1920,
                render: bool = True) -> Sample:
    q, t = random_pose(key)
    K = scaled_intrinsics(height, width)
    R = camera.quat_to_rotmat(q)
    uv = camera.project_points(points_3d, R, t, K)
    margin = 12.0
    x1 = jnp.clip(jnp.min(uv[:, 0]) - margin, 0, width - 1)
    y1 = jnp.clip(jnp.min(uv[:, 1]) - margin, 0, height - 1)
    x2 = jnp.clip(jnp.max(uv[:, 0]) + margin, 0, width - 1)
    y2 = jnp.clip(jnp.max(uv[:, 1]) + margin, 0, height - 1)
    bbox = jnp.stack([x1, y1, x2, y2])
    image = (render_frame(uv, height, width) if render
             else jnp.zeros((height, width), jnp.float32))
    return Sample(image=image, bbox=bbox, keypoints_2d=uv, quat=q, trans=t)


@partial(jax.jit, static_argnames=('batch_size', 'crop_size', 'sigma',
                                   'render', 'with_frames', 'height',
                                   'width', 'augment_geom',
                                   'augment_photo'))
def make_batch(key: jax.Array, batch_size: int, points_3d: jnp.ndarray,
               crop_size: int = 128, sigma: float = 2.0,
               render: bool = True,
               with_frames: bool = False,
               height: int = 1200, width: int = 1920,
               augment_geom: bool = False,
               augment_photo: bool = False
               ) -> dict[str, jnp.ndarray]:
    """A full training batch: crops + heatmap/weight targets (NHWC).

    Pipeline parity with ESADataSet.__getitem__ (data_load4.py:103-203),
    but batched and fused on device: crop x1.05 square -> resize ->
    keypoints to crop space -> Gaussian targets + weight maps -> normalize.

    For training throughput the crop imagery is rendered directly in crop
    space (sum of Gaussian blobs at the crop-space keypoints with the
    crop-scaled spot size) instead of rendering 1920x1200 frames and
    resampling them — identical geometry, ~100x less pixel work.

    ``with_frames=True`` additionally renders the full frames (keys
    'frame' (B, H, W) and full-frame 'keypoints_2d') so evaluation can
    drive the complete frames -> crop -> heatmap -> pose serving path on
    exactly the samples that produced the targets.
    """
    keys = jax.random.split(key, batch_size)
    samples = jax.vmap(
        lambda k: make_sample(k, points_3d, height=height, width=width,
                              render=False))(keys)
    origins, crop_sizes, size = crop_ops.adjust_bbox(samples.bbox,
                                                     img_w=width,
                                                     img_h=height)
    rates = crop_size / size.astype(jnp.float32)
    kp_crop = (samples.keypoints_2d - origins[:, None, :].astype(jnp.float32)
               ) * rates[:, None, None]
    if augment_geom:
        # Train-time geometric augmentation (the reference only
        # color-jitters, data_load4.py:78-83): per-sample horizontal
        # flip (p=0.5) + uniform in-plane rotation about the crop
        # center, applied to the crop-space KEYPOINTS BEFORE the crop
        # imagery and targets are rendered from them — exact and free,
        # no resampling pass.  Mirrored/rolled constellations are
        # consistent input->target pairs (each keypoint's blob is
        # rendered at its transformed location), so the net sees edge
        # truncations and unusual in-plane attitudes at train time.
        # Pose labels (quat/trans) are NOT transformed; augmented
        # batches are for heatmap training only (the eval path calls
        # this function without augment_geom).
        kf, kr = jax.random.split(jax.random.fold_in(key, 17), 2)
        flip = jax.random.bernoulli(kf, 0.5, (batch_size,))
        theta = jax.random.uniform(kr, (batch_size,),
                                   minval=-jnp.pi, maxval=jnp.pi)
        c = (crop_size - 1) / 2.0
        x = jnp.where(flip[:, None], 2.0 * c - kp_crop[..., 0],
                      kp_crop[..., 0]) - c
        y = kp_crop[..., 1] - c
        ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
        kp_crop = jnp.stack([c + ct * x - st * y,
                             c + st * x + ct * y], axis=-1)
    hm, wm = heatmap_ops.render_targets(kp_crop, crop_size, crop_size, sigma)
    if render:
        spot = heatmap_ops.render_heatmaps(
            kp_crop, crop_size, crop_size, 1.0)
        # per-(sample, keypoint) spot sigma = sigma_k * rate via the
        # exponent trick exp(-d2/2)^(1/s^2) = exp(-d2/(2 s^2))
        sigmas, amps = _spot_params(points_3d.shape[0])
        s2 = (sigmas[None, :] * rates[:, None]) ** 2
        spot = spot ** (1.0 / s2[:, :, None, None])
        crops = jnp.clip(
            jnp.sum(amps[None, :, None, None] * spot, axis=1), 0.0, 1.0
        ) * 255.0
    else:
        crops = jnp.zeros((batch_size, crop_size, crop_size), jnp.float32)
    if augment_photo:
        # Photometric robustness augmentation on the [0,255] crop
        # imagery: exposure gain/offset + the noise-or-blur coin (the
        # reference's entire photometric story was crop-level
        # ColorJitter, data_load4.py:78-83 — which cannot teach
        # noise/blur invariance; see cli/eval_synthetic --perturb for
        # the measured collapse of a clean-trained net)
        from esa_pose_estimation_tpu.data.augment import perturb_capture
        crops = perturb_capture(jax.random.fold_in(key, 29), crops)
    image = crop_ops.normalize(crops)[..., None]           # (B, S, S, 1)
    batch = {
        'image': image,
        'heatmaps': jnp.transpose(hm, (0, 2, 3, 1)),       # NHWC
        'weights': jnp.transpose(wm, (0, 2, 3, 1)),
        'keypoints_crop': kp_crop,
        'rate': rates,
        'origin': origins,
        'quat': samples.quat,
        'trans': samples.trans,
        'bbox': samples.bbox,
    }
    if with_frames:
        batch['frame'] = jax.vmap(
            lambda kp: render_frame(kp, height, width))(samples.keypoints_2d)
        batch['keypoints_2d'] = samples.keypoints_2d
    return batch
