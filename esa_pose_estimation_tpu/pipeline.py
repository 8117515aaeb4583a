"""The fused serving pipeline: frames -> boxes -> crops -> keypoints -> pose.

Single source of truth for the end-to-end inference path that the reference
spreads across demo.py:133-275 / val.py:136-233 (per-image Python loop with
GPU->CPU syncs at every stage).  Here every stage is batched and the whole
chain is one jitted XLA program per batch: the only host interaction is
feeding frames in and reading poses out.

Stages (reference parity):
  1. detect (optional)        — simple_detect.py equivalent, or given boxes
  2. square crop x1.05+resize — data_load4.py:110-166
  3. HRNet heatmaps           — models/seg_hrnet3.py forward
  4. peak decode + log-Taylor — inference.py:22-94
  5. confidence top-k select  — demo.py:195-200 / val.py:172-177
  6. RANSAC-EPnP + LM refine  — pnp.py:46-90 + cpnp.cpnp_m
  7. quaternion output        — demo.py:301-303
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.core import camera
from esa_pose_estimation_tpu.core.camera import rotmat_to_quat
from esa_pose_estimation_tpu.ops import crop as crop_ops
from esa_pose_estimation_tpu.ops import peak as peak_ops
from esa_pose_estimation_tpu.ops import pnp as pnp_mod


class PoseOutput(NamedTuple):
    quat: jnp.ndarray          # (B, 4) (w, x, y, z)
    trans: jnp.ndarray         # (B, 3)
    R: jnp.ndarray             # (B, 3, 3)
    keypoints_2d: jnp.ndarray  # (B, K, 2) full-frame pixel predictions
    confidences: jnp.ndarray   # (B, K) heatmap peak values
    selected: jnp.ndarray      # (B, K) bool keypoints used for the pose
    heatmaps: jnp.ndarray      # (B, S, S, K) network output (device-lazy;
    #                            only transferred if the caller reads it —
    #                            eval panels and evidence debugging do)
    rates: jnp.ndarray         # (B,) crop rate (uncrop: pred/rate+origin)
    origins: jnp.ndarray       # (B, 2) crop top-left


def infer_poses(model, variables, frames: jnp.ndarray, bboxes: jnp.ndarray,
                points_3d: jnp.ndarray, key: jax.Array,
                K: jnp.ndarray | None = None,
                crop_size: int = 128,
                conf_threshold: float = 0.6,
                min_keypoints: int = 24,
                n_hypotheses: int = 32,
                sample_size: int = 6,
                lm_iters: int = 10,
                norm_mean: float = 0.449,
                norm_std: float = 0.229,
                disambiguate: bool = True,
                crop_rule: str = 'train',
                flip_tta: bool = False,
                mirror_evidence: str = 'heatmap') -> PoseOutput:
    """Batched frames + detector boxes -> poses.  Fully jittable.

    frames: (B, H, W) grayscale [0, 255]; bboxes: (B, 4) [x1, y1, x2, y2];
    points_3d: (K, 3) model keypoints (the reference's ``sift3d``).
    ``norm_mean``: 0.449 for the train/eval path (data_load4.py:81),
    0.485 for the submission datasets (data_load_val.py), 0.5 for the
    train+real mixed set (data_load5.py).
    ``crop_rule``: 'train' = ESADataSet box rule (data_load4.py:110-146),
    'val' = ESAValDataSet submission rule without square-equalization
    (data_load_val.py:125-157).
    """
    if crop_rule not in ('train', 'val'):
        raise ValueError(f'unknown crop_rule {crop_rule!r}')
    crops, rates, origins = crop_ops.crop_resize(
        frames, bboxes, crop_size,
        img_w=frames.shape[2], img_h=frames.shape[1],
        force_square=crop_rule == 'train')
    return infer_poses_from_crops(
        model, variables, crops, rates, origins, points_3d, key, K=K,
        conf_threshold=conf_threshold, min_keypoints=min_keypoints,
        n_hypotheses=n_hypotheses, sample_size=sample_size,
        lm_iters=lm_iters, norm_mean=norm_mean, norm_std=norm_std,
        disambiguate=disambiguate, flip_tta=flip_tta,
        mirror_evidence=mirror_evidence)


def infer_poses_from_crops(model, variables, crops: jnp.ndarray,
                           rates: jnp.ndarray, origins: jnp.ndarray,
                           points_3d: jnp.ndarray, key: jax.Array,
                           K: jnp.ndarray | None = None,
                           conf_threshold: float = 0.6,
                           min_keypoints: int = 24,
                           n_hypotheses: int = 32,
                           sample_size: int = 6,
                           lm_iters: int = 10,
                           norm_mean: float = 0.449,
                           norm_std: float = 0.229,
                           disambiguate: bool = True,
                           flip_tta: bool = False,
                           mirror_evidence: str = 'heatmap') -> PoseOutput:
    """The serving tail from already-cropped imagery: normalize -> HRNet
    -> decode -> select -> uncrop -> RANSAC-EPnP -> dual-LM.

    crops (B, S, S) [0, 255]; rates (B,); origins (B, 2) — the outputs of
    ``ops.crop.crop_resize`` (or the C++ loader's host-crop mode).  The
    crop stage is separable because everything downstream only needs the
    crop imagery plus the (rate, origin) uncrop transform; callers with a
    FIXED evaluation split exploit this by cropping once and re-running
    only the tail every epoch (cli/train.py:EvalCache — the crop cache
    also cuts per-eval H2D from 2.3 MB/frame to 65 KB/frame).
    """
    if K is None:
        K = jnp.asarray(camera.SPEED_K, jnp.float32)
    x = crop_ops.normalize(crops, norm_mean, norm_std)[..., None]
    hm = model.apply(variables, x, train=False)           # (B, S, S, K)
    if flip_tta:
        # flip-TTA (transforms.py:16-30 flip_back semantics, batched in
        # NHWC): forward the mirrored crop, un-flip its heatmaps, average.
        # SPEED's 30 spacecraft keypoints have no left/right pairs, so the
        # channel swap is the identity; 2x forward cost.
        hm_f = model.apply(variables, x[:, :, ::-1, :], train=False)
        hm = (hm + hm_f[:, :, ::-1, :]) * 0.5
    coords, maxvals = peak_ops.decode_heatmaps_auto_nhwc(hm)
    sel = peak_ops.select_confident(maxvals, conf_threshold,
                                    min_count=min_keypoints)
    uncropped = (coords / rates[:, None, None]
                 + origins[:, None, :].astype(jnp.float32))
    p3 = jnp.broadcast_to(points_3d, (crops.shape[0],) + points_3d.shape)
    init = pnp_mod.ransac_epnp(p3, uncropped, K, key, valid=sel,
                               n_hypotheses=n_hypotheses,
                               sample_size=sample_size, lm_iters=lm_iters)
    # Final confidence-weighted refinement over the RANSAC inliers only.
    # The reference weighs all top-k keypoints (val.py:202) — safe there
    # because its confidences correlate with correctness; keeping the
    # geometric inlier mask additionally rejects confident-but-wrong
    # keypoints (identity swaps), falling back to the selection when the
    # inlier set is degenerate.
    keep = init.inliers & sel
    enough = (keep.sum(axis=-1) >= 4)[..., None]
    keep = jnp.where(enough, keep, sel)
    w = jnp.where(keep, maxvals, 0.0)
    # `disambiguate` also refines the weak-perspective mirror pose and
    # keeps the better one — rescues ~90-degree rotation flips on
    # far-depth frames (see ops/pnp.lm_refine_dual) for one extra
    # batched LM problem per frame.  ``mirror_evidence='heatmap'`` picks
    # between the two candidates by summed heatmap likelihood at their
    # reprojections (the network's full spatial belief) instead of LM
    # cost alone.
    if disambiguate:
        ev_fn = None
        if mirror_evidence == 'heatmap':
            ev_fn = pnp_mod.heatmap_evidence(
                hm.astype(jnp.float32), p3, K, rates, origins, valid=sel)
        R, t = pnp_mod.lm_refine_dual(p3, uncropped, w, K, init.R, init.t,
                                      iters=lm_iters, evidence_fn=ev_fn)
    else:
        R, t = pnp_mod.lm_refine(p3, uncropped, w, K, init.R, init.t,
                                 iters=lm_iters)
    return PoseOutput(quat=rotmat_to_quat(R), trans=t, R=R,
                      keypoints_2d=uncropped, confidences=maxvals,
                      selected=sel, heatmaps=hm, rates=rates,
                      origins=origins)


def make_jitted_pipeline(model, points_3d: jnp.ndarray,
                         K: jnp.ndarray | None = None,
                         **kwargs):
    """Returns jitted fn(variables, frames, bboxes, key) -> PoseOutput."""
    fn = partial(infer_poses, model, points_3d=points_3d, K=K, **kwargs)

    @jax.jit
    def run(variables, frames, bboxes, key):
        return fn(variables, frames=frames, bboxes=bboxes, key=key)

    return run


def downsample_frames(frames: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool (B, H, W) frames by an integer factor (detector input).

    H and W must be divisible by ``factor`` (1920x1200 divides by 2/4/8)."""
    frames = frames.astype(jnp.float32)   # loaders may ship uint8 frames
    if factor == 1:
        return frames
    b, h, w = frames.shape
    return frames.reshape(b, h // factor, factor,
                          w // factor, factor).mean(axis=(2, 4))


def detect_frames(detector_model, detector_vars, frames: jnp.ndarray,
                  detector_stride: int = 16, detector_downscale: int = 4,
                  box_expand: float = 1.0
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frames -> one full-frame-pixels box per image (+ score).

    The detector runs on ``factor``x average-pooled frames — the SPEED
    spacecraft spans hundreds of pixels, so a quarter-resolution pass
    keeps localization accuracy while cutting detector FLOPs 16x (the
    reference similarly let YOLOv5 letterbox-resize its input).  Falls
    back to the full frame when no box clears the score threshold.
    ``box_expand`` grows each box about its center (a safety margin so a
    slightly-tight box does not clip keypoints out of the crop; the
    downstream crop additionally applies the reference's x1.05 factor).
    """
    from esa_pose_estimation_tpu.models.detector import decode_detections

    ds = downsample_frames(frames, detector_downscale)
    det_out = detector_model.apply(detector_vars, ds[..., None],
                                   train=False)
    boxes, scores, valid = decode_detections(det_out, detector_stride,
                                             max_outputs=1,
                                             score_threshold=0.05)
    h, w = frames.shape[1], frames.shape[2]
    full = jnp.asarray([0.0, 0.0, w - 1.0, h - 1.0], jnp.float32)
    up = boxes[:, 0, :] * float(detector_downscale)
    if box_expand != 1.0:
        c = (up[:, :2] + up[:, 2:]) / 2.0
        half = (up[:, 2:] - up[:, :2]) / 2.0 * box_expand
        up = jnp.concatenate([c - half, c + half], axis=-1)
    up = jnp.clip(up, 0.0, jnp.asarray([w - 1.0, h - 1.0] * 2, jnp.float32))
    bboxes = jnp.where(valid[:, 0, None], up, full[None, :])
    return bboxes, scores[:, 0]


def detect_and_infer(detector_model, detector_vars, model, variables,
                     frames: jnp.ndarray, points_3d: jnp.ndarray,
                     key: jax.Array, detector_stride: int = 16,
                     detector_downscale: int = 4,
                     **kwargs) -> PoseOutput:
    """Two-stage pipeline with the on-device detector supplying boxes
    (reference BASELINE config 3: detect -> crop -> keypoint, fused)."""
    bboxes, _ = detect_frames(detector_model, detector_vars, frames,
                              detector_stride, detector_downscale)
    return infer_poses(model, variables, frames, bboxes, points_3d, key,
                       **kwargs)
