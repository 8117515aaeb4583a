"""Held-out synthetic SPEED evaluation with per-frame score statistics.

Loads a trained checkpoint and scores N held-out synthetic frames (seeds
disjoint from the training stream) through the full serving pipeline,
printing median / p90 / mean SPEED score and the fraction of frames
beating the reference leaderboard score (0.0193, README.md:11) — the
QUALITY.md methodology.  Mirrors the per-image scoring of the reference's
``demo.val`` (demo.py:295-310) but batched.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('EPT_COMPILE_CACHE',
                                 os.path.expanduser('~/.ept_jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--workdir', default='runs/esa_syn')
    ap.add_argument('--checkpoint', default='best_rotate')
    ap.add_argument('--artifact', default=None,
                    help='evaluate a portable inference artifact '
                         '(utils/artifact.py npz) instead of an orbax '
                         'checkpoint under --workdir — the one-command '
                         'reproduction path for the QUALITY.md table '
                         '(e.g. artifacts/esa_syn_best.npz)')
    ap.add_argument('--frames', type=int, default=128)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--seed', type=int, default=991)
    ap.add_argument('--n-hypotheses', type=int, default=64)
    ap.add_argument('--detector-workdir', default=None,
                    help='score the two-stage pipeline: boxes come from '
                         'this trained detector instead of ground truth')
    ap.add_argument('--detector-downscale', type=int, default=None,
                    help='average-pool factor for the detector input; '
                         'defaults to the detector.json sidecar written '
                         'by its training run (4 if neither is given)')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny model topology (must match a --tiny '
                         'training run)')
    ap.add_argument('--crop-size', type=int, default=128)
    ap.add_argument('--flip-tta', action='store_true',
                    help='average heatmaps with a mirrored-input forward '
                         'pass (transforms.py:16-30 flip_back semantics); '
                         '2x forward cost')
    ap.add_argument('--int8', action='store_true',
                    help='serve the FLOP-dominant head conv in int8 '
                         '(models/layers.py INT8_SERVING; experimental) — '
                         'this flag IS the accuracy gate: compare scores '
                         'with/without before enabling anywhere else')
    ap.add_argument('--perturb', action='store_true',
                    help='score the held-out frames through capture-'
                         'condition perturbations (per-frame exposure '
                         'gain/offset + gaussian-noise-or-motion-blur '
                         'coin, data/augment.py:perturb_capture — the '
                         'same transform cli/train --augment-photo '
                         'trains through and cli/train_detector '
                         '--augment uses).  Applied to the FULL frame '
                         'before crop, i.e. the deployment capture '
                         'condition, not a crop-space approximation')
    ap.add_argument('--mirror-evidence', choices=('heatmap', 'cost'),
                    default='heatmap',
                    help='mirror-pose disambiguation signal: reprojected-'
                         'keypoint heatmap likelihood (default) or LM '
                         'cost alone (the round-2 behavior)')
    args = ap.parse_args(argv)

    import os

    from esa_pose_estimation_tpu.data import synthetic
    from esa_pose_estimation_tpu.eval.speed_score import (
        speed_score_from_matrices,
    )
    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.train import state as state_mod
    from esa_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    if args.int8:
        from esa_pose_estimation_tpu.models import layers
        layers.INT8_SERVING = True

    model_cfg = cfg_mod.hrnet_tiny() if args.tiny else cfg_mod.hrnet_esa()
    model = HRNet(model_cfg, dtype=jnp.bfloat16)
    if args.artifact:
        from esa_pose_estimation_tpu.utils.artifact import (
            load_inference_artifact,
        )
        variables, meta = load_inference_artifact(args.artifact)
        # cross-check the artifact's recorded config against the flags:
        # a flagship artifact evaluated with --tiny (or a crop-size
        # mismatch) would otherwise die deep inside flax with an opaque
        # param-structure error
        want_model = 'hrnet_tiny' if args.tiny else 'hrnet_esa'
        if meta.get('model') and meta['model'] != want_model:
            raise SystemExit(
                f"artifact {args.artifact} was exported from "
                f"{meta['model']!r} but the flags select {want_model!r} "
                f"({'drop' if args.tiny else 'pass'} --tiny)")
        if meta.get('crop_size') and meta['crop_size'] != args.crop_size:
            raise SystemExit(
                f"artifact {args.artifact} expects --crop-size "
                f"{meta['crop_size']}, got {args.crop_size}")
        print(f'# loaded artifact {args.artifact} ({meta})')
    else:
        st = state_mod.create_train_state(
            model, cfg_mod.TrainConfig(crop_size=args.crop_size),
            jax.random.PRNGKey(0),
            (1, args.crop_size, args.crop_size, 1))
        ckpt = CheckpointManager(os.path.join(args.workdir, 'net_esa'))
        st, epoch = ckpt.restore_required(args.checkpoint, st)
        print(f'# loaded {args.checkpoint} (epoch {epoch - 1})')
        variables = {'params': st.params, 'batch_stats': st.batch_stats}
    points_3d = synthetic.spacecraft_points(model_cfg.num_keypoints)

    detect = None
    if args.detector_workdir:
        from esa_pose_estimation_tpu.cli.train_detector import (
            create_detector_state,
        )
        from esa_pose_estimation_tpu.models.detector import (
            TinyDetector,
            load_detector_config,
        )
        from esa_pose_estimation_tpu.pipeline import detect_frames

        dcfg = load_detector_config(args.detector_workdir) or {}
        ds = args.detector_downscale or dcfg.get('downscale', 4)
        det = TinyDetector(width=dcfg.get('width_ch', 32),
                           stride=dcfg.get('stride', 16))
        dst = create_detector_state(det, jax.random.PRNGKey(1), 1e-3,
                                    (1200 // ds, 1920 // ds),
                                    total_steps=1000)
        ddir = os.path.join(args.detector_workdir, 'net_detector')
        name = 'best_iou' if os.path.exists(
            os.path.join(ddir, 'best_iou')) else 'last'
        # required: random detector weights would print badly degraded
        # pose scores with exit code 0 (same failure mode the keypoint
        # net's restore_required guards against)
        dst, _ = CheckpointManager(ddir).restore_required(name, dst)
        det_vars = {'params': dst.params, 'batch_stats': dst.batch_stats}

        def detect(frames):
            boxes, _ = detect_frames(det, det_vars, frames,
                                     detector_stride=det.stride,
                                     detector_downscale=ds, box_expand=1.1)
            return boxes

    from esa_pose_estimation_tpu.pipeline import make_jitted_pipeline
    run = make_jitted_pipeline(model, points_3d,
                               crop_size=args.crop_size,
                               conf_threshold=0.6, min_keypoints=0,
                               n_hypotheses=args.n_hypotheses,
                               flip_tta=args.flip_tta,
                               mirror_evidence=args.mirror_evidence)
    all_scores = []
    depths = []
    pix_err_sum = 0.0
    pix_err_n = 0
    n_batches = -(-args.frames // args.batch_size)
    for i in range(n_batches):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        batch = synthetic.make_batch(key, args.batch_size, points_3d,
                                     with_frames=True)
        frames = batch['frame']
        if args.perturb:
            from esa_pose_estimation_tpu.data.augment import perturb_capture
            frames = jax.jit(perturb_capture)(
                jax.random.fold_in(key, 4242), frames)
        boxes = detect(frames) if detect else batch['bbox']
        out = run(variables, frames, boxes, jax.random.fold_in(key, 7))
        s = speed_score_from_matrices(out.R, out.trans, batch['quat'],
                                      batch['trans'])
        all_scores.append(np.asarray(s.score_t) + np.asarray(s.score_r))
        depths.append(np.asarray(batch['trans'])[:, 2])
        # Per-keypoint pixel error over the confidence-selected peaks
        # (reference "Gaiss" stat, demo.py:328-339 / main.log:6434).
        # Truncate the last batch to --frames so this statistic covers
        # exactly the same frame set as every other aggregate.
        take = min(args.batch_size, args.frames - i * args.batch_size)
        err = np.linalg.norm(np.asarray(out.keypoints_2d) -
                             np.asarray(batch['keypoints_2d']), axis=-1)
        m = np.asarray(out.selected)
        pix_err_sum += float((err * m)[:take].sum())
        pix_err_n += int(m[:take].sum())
    scores = np.concatenate(all_scores)[:args.frames]
    depths = np.concatenate(depths)[:args.frames]

    # Safety net: a non-finite pose (solver divergence) must show up as a
    # reported count, not silently poison every aggregate statistic —
    # filter unconditionally; all-nonfinite yields an explicit null
    # report (NaN/Infinity tokens would make the line invalid JSON).
    finite = np.isfinite(scores)
    n_nonfinite = int((~finite).sum())
    scores, depths = scores[finite], depths[finite]

    ref = 0.0193
    if scores.size == 0:
        out = {
            'frames': 0,
            'nonfinite_frames': n_nonfinite,
            'median': None, 'p90': None, 'mean': None,
            'beat_reference_frac': None, 'worst': None,
            'worst_depth_m': None,
            'pix_err_px': round(pix_err_sum / max(pix_err_n, 1), 3),
            'error': 'every frame produced a non-finite pose',
        }
        print(json.dumps(out))
        return out
    out = {
        'frames': int(len(scores)),
        'nonfinite_frames': n_nonfinite,
        'median': round(float(np.median(scores)), 4),
        'p90': round(float(np.percentile(scores, 90)), 4),
        'mean': round(float(scores.mean()), 4),
        'beat_reference_frac': round(float((scores < ref).mean()), 3),
        'worst': round(float(scores.max()), 3),
        'worst_depth_m': round(float(depths[scores.argmax()]), 1),
        'pix_err_px': round(pix_err_sum / max(pix_err_n, 1), 3),
    }
    print(json.dumps(out))
    return out


if __name__ == '__main__':
    main()
