"""LINEMOD training driver — the reference ``main2.py`` path as a CLI.

Two model modes, matching the reference's two LINEMOD formulations:

* ``--mode heatmap``: ResNet-8s regressing K keypoint heatmaps (the
  data_load3.py / main2.py path — same loss/decode stack as ESA);
* ``--mode pvnet``: ResNet-8s-2o regressing segmentation + vertex fields
  (the lib/ PVNet path), evaluated through RANSAC voting + uncertainty PnP.

Evaluation reports the LINEMOD triple (2D-projection / ADD / 5cm5°,
evaluation.py:526-532 parity).  Two data sources:

* default: a synthetic sphere-ish model with rendered masks
  (utils/render.py), exercising the identical compute path;
* ``--pkl-dir DIR --image-root ROOT``: the reference's real data2/ pickle
  layout (data_load3.py:89-121) — real-train + render[:10000] + fuse
  record mixing, LINEMOD crop rule (x1.1, min-size, 640x480 clamp),
  ImageNet RGB normalization, eval on the {cls}_test.pkl split, and
  optional OCCLUSION_LINEMOD eval (``--occ-pkl-dir`` + ``--occ-image-root``,
  result_show.py:95-98 parity) appended to ``<workdir>/occ_result.txt``.

Usage:
  python -m esa_pose_estimation_tpu.cli.train_linemod --workdir runs/cat \
      --mode pvnet [--epochs 10] [--pkl-dir data2 --image-root LINEMOD/]
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from esa_pose_estimation_tpu.core import camera
from esa_pose_estimation_tpu.data import linemod as linemod_data
from esa_pose_estimation_tpu.data.linemod import LineModModelDB
from esa_pose_estimation_tpu.ops import crop as crop_ops
from esa_pose_estimation_tpu.eval import evaluator
from esa_pose_estimation_tpu.models.resnet8s import (
    ResNet8s2o,
    pvnet_loss,
    resnet18_8s,
)
from esa_pose_estimation_tpu.obs import JsonlLogger, TsvLogger
from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops
from esa_pose_estimation_tpu.ops import peak as peak_ops
from esa_pose_estimation_tpu.ops import pnp as pnp_mod
from esa_pose_estimation_tpu.ops import vertex as vertex_ops
from esa_pose_estimation_tpu.ops import voting as voting_ops
from esa_pose_estimation_tpu.train.checkpoint import CheckpointManager
from esa_pose_estimation_tpu.train.loss import weighted_heatmap_loss
from esa_pose_estimation_tpu.utils import render


import dataclasses
from typing import Any


@dataclasses.dataclass
class _CkptState:
    """Minimal TrainState-shaped shim for CheckpointManager (this CLI
    threads raw params/batch_stats/opt_state through its jitted step)."""
    params: Any
    batch_stats: Any
    opt_state: Any

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def synthetic_linemod_batch(key, batch_size, db, model_pts, faces, kp3d,
                            size=128):
    """Rendered LINEMOD-like batch: pose -> depth-shaded render -> targets.

    The network input is the depth-shaded surface (``image``), not the
    binary silhouette: a silhouette of a near-convex object is almost
    pose-invariant, which makes keypoint regression ill-posed; shading
    restores the 3D appearance cue real LINEMOD photos carry.  ``mask``
    stays binary for the seg / vertex-field targets.
    """
    K = jnp.asarray(camera.LINEMOD_K, jnp.float32) * (size / 640.0)
    K = K.at[2, 2].set(1.0)
    keys = jax.random.split(key, batch_size)

    def one(k):
        kq, kt = jax.random.split(k)
        q = jax.random.normal(kq, (4,))
        q = q / jnp.linalg.norm(q)
        R = camera.quat_to_rotmat(q)
        t = jnp.array([0.0, 0.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * \
            jax.random.uniform(kt, (), minval=0.35, maxval=0.55)
        mask, depth = render.rasterize(model_pts, faces, R, t, K, size,
                                       size)
        maskf = mask.astype(jnp.float32)
        # depth-shade inside the mask: near surface bright, far dim
        zc = t[2]
        finite = jnp.where(jnp.isfinite(depth), depth, zc)
        shade = jnp.clip(1.0 - (finite - (zc - 0.2)) / 0.4, 0.0, 1.0)
        image = shade * maskf
        kp2d = camera.project_points(kp3d, R, t, K)
        return image, maskf, kp2d, R, t

    images, masks, kp2d, Rs, ts = jax.vmap(one)(keys)
    return {'image': images, 'mask': masks, 'keypoints_2d': kp2d,
            'R': Rs, 't': ts, 'K': K}


def make_icosphere(radius=0.06, subdiv=2):
    """Small triangulated sphere mesh (synthetic LINEMOD object)."""
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                      [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                      [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                     float)
    faces = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                      [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                      [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                      [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                      [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                     np.int32)
    for _ in range(subdiv):
        new_faces = []
        verts = verts.tolist()
        cache = {}

        def mid(a, b):
            kk = (min(a, b), max(a, b))
            if kk not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                verts.append(m.tolist())
                cache[kk] = len(verts) - 1
            return cache[kk]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int32)
        verts = np.asarray(verts, float)
    verts = np.asarray(verts, float)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    # Lumpy asymmetric deformation: an ellipsoid keeps a 4-element
    # rotation symmetry group (silhouette-identical poses), which makes
    # pose-from-appearance ill-posed; angular bumps give the object a
    # trivial symmetry group so every pose is visually distinct.
    az = np.arctan2(verts[:, 1], verts[:, 0])
    el = np.arcsin(np.clip(verts[:, 2] / radius, -1, 1))
    bump = (1.0 + 0.35 * np.sin(3 * az) * np.cos(el)
            + 0.25 * np.sin(2 * el + 0.7) * np.cos(az + 0.3))
    verts *= bump[:, None]
    verts[:, 2] *= 0.75
    verts[:, 0] *= 1.15
    return verts.astype(np.float32), faces


def make_real_step(model, mode: str, size: int, num_keypoints: int, tx,
                   augment: bool = False):
    """One jitted optimizer step on real-layout batches: device-side
    LINEMOD crop (x1.1 rule) -> [augmentation] -> RGB normalize ->
    targets -> loss.

    ``augment=True`` runs the reference's real-LINEMOD training chain
    (LineModDatasetRealAug.augmentation, linemod_dataset.py:256-293) as
    batched device ops on the crops: occlusion mask-out (p=0.5) ->
    instance rotation -> crop_resize_instance_v2 (scale + window jitter)
    -> horizontal flip (p=0.5) -> add_noise (gaussian/motion blur),
    with keypoints transformed alongside.
    """
    from esa_pose_estimation_tpu.data import augment as aug_ops

    @jax.jit
    def step(params, batch_stats, opt_state, frames, bboxes, kp2d, masks,
             key):
        origin, crop_sizes, csize = crop_ops.adjust_bbox_linemod(
            bboxes, img_w=frames.shape[2], img_h=frames.shape[1],
            min_size=size)
        crops = crop_ops.crop_resize_stretch(frames, origin, crop_sizes,
                                             size)
        rate = size / csize.astype(jnp.float32)
        kp_crop = (kp2d - origin[:, None, :].astype(jnp.float32)
                   ) * rate[:, None, None]
        mcrop = (crop_ops.crop_resize_stretch(
            masks, origin, crop_sizes, size) > 0.5).astype(jnp.float32)
        if augment:
            ko, kr, kc, kf, kn, ksel = jax.random.split(key, 6)
            occluded = aug_ops.random_occlusion(ko, mcrop)
            do_occ = jax.random.bernoulli(ksel, 0.5, (mcrop.shape[0],))
            mcrop = jnp.where(do_occ[:, None, None], occluded, mcrop)
            crops, mcrop, kp_crop = aug_ops.random_rotate(
                kr, crops, mcrop, kp_crop,
                max_deg=30.0)
            crops, mcrop, kp_crop = aug_ops.random_crop_resize_v2(
                kc, crops, mcrop, kp_crop, size, size)
            crops, mcrop, kp_crop = aug_ops.random_flip(
                kf, crops, mcrop, kp_crop)
            crops = aug_ops.random_add_noise(kn, crops)
        img = crop_ops.normalize_rgb(crops)

        def loss_fn(p):
            out, mut = model.apply({'params': p, 'batch_stats': batch_stats},
                                   img, train=True, mutable=['batch_stats'])
            if mode == 'heatmap':
                hm, wm = heatmap_ops.render_targets(kp_crop, size, size, 2.0)
                loss = weighted_heatmap_loss(
                    out, jnp.transpose(hm, (0, 2, 3, 1)),
                    jnp.transpose(wm, (0, 2, 3, 1)))
            else:
                seg, vert = out
                target = vertex_ops.vertex_field(mcrop, kp_crop)
                loss = pvnet_loss(seg, vert, mcrop, target)
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), mut['batch_stats'],
                opt_state, loss)

    return step


def evaluate_real(model, params, batch_stats, loader, db, cls: str,
                  mode: str, size: int, num_keypoints: int,
                  key) -> dict[str, float]:
    """Real-split eval: crop -> forward -> decode -> uncrop -> PnP ->
    LINEMOD triple (result_show.py val-loop semantics, batched)."""
    meters = {k: evaluator.AverageMeter()
              for k in ('projection_2d', 'add', 'cm_degree_5')}
    model_pts = jnp.asarray(db.get_ply_model(cls), jnp.float32)
    diameter = db.get_diameter(cls)
    symmetric = db.is_symmetric(cls)
    for bi, batch in enumerate(loader):
        frames = jnp.asarray(batch['frame'])
        bboxes = jnp.asarray(batch['bbox'])
        n = frames.shape[0]
        origin, crop_sizes, csize = crop_ops.adjust_bbox_linemod(
            bboxes, img_w=frames.shape[2], img_h=frames.shape[1],
            min_size=size)
        crops = crop_ops.crop_resize_stretch(frames, origin, crop_sizes,
                                             size)
        img = crop_ops.normalize_rgb(crops)
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          img, train=False)
        rate = size / csize.astype(jnp.float32)
        kp3d = jnp.asarray(batch['keypoints_3d'])
        Kc = jnp.asarray(batch['K'])
        bkey = jax.random.fold_in(key, bi)
        if mode == 'heatmap':
            hm = jnp.transpose(out, (0, 3, 1, 2))
            coords, maxvals = peak_ops.decode_heatmaps(hm)
            full = coords / rate[:, None, None] \
                + origin[:, None, :].astype(jnp.float32)
            res = pnp_mod.ransac_epnp(kp3d, full, Kc, bkey)
            R_pred, t_pred = res.R, res.t
        else:
            seg, vert = out
            seg_mask = (jnp.argmax(seg, axis=-1) == 1).astype(jnp.float32)
            field = vert.reshape(vert.shape[:3] + (num_keypoints, 2))
            vres = voting_ops.ransac_voting(seg_mask, field, bkey)
            kp_mean, kp_cov = \
                voting_ops.estimate_voting_distribution_with_mean(
                    seg_mask, field, vres.keypoints,
                    jax.random.fold_in(bkey, 1))
            full = kp_mean / rate[:, None, None] \
                + origin[:, None, :].astype(jnp.float32)
            # covariance scales back by 1/rate^2 under the uncrop
            cov_full = kp_cov / (rate[:, None, None, None] ** 2)
            R_pred, t_pred = pnp_mod.uncertainty_pnp(
                kp3d, full, cov_full, Kc, jax.random.fold_in(bkey, 2))
        acc = evaluator.pose_accuracy(
            model_pts, diameter, Kc, R_pred, t_pred,
            jnp.asarray(batch['R']), jnp.asarray(batch['t']),
            symmetric=symmetric)
        for k in meters:
            meters[k].update(float(acc[k]), n=n)
    return {k: m.avg for k, m in meters.items()}


def train(args) -> dict:
    os.makedirs(args.workdir, exist_ok=True)
    db = LineModModelDB()
    use_real = args.pkl_dir is not None
    size = args.crop_size
    if use_real:
        train_records = linemod_data.load_mixed_train_records(
            args.pkl_dir, args.cls, use_fuse=args.use_fuse,
            use_render=args.use_render)
        test_records = linemod_data.load_real_split(args.pkl_dir, args.cls,
                                                    'test')
        args.num_keypoints = int(np.asarray(
            train_records[0]['sift']).reshape(-1, 2).shape[0])
        if args.ply:
            db.register(args.cls, ply_path=args.ply)
        else:
            # no mesh supplied: the record's 3D keypoint cloud stands in as
            # the ADD model (coarser than the full PLY, same metric shape)
            db.register(args.cls, vertices=np.asarray(
                train_records[0]['sift_3d'], np.float32).reshape(-1, 3))
        facesj = model_pts = kp3d = None
    else:
        verts, faces = make_icosphere()
        db.register(args.cls, vertices=verts)
        kp3d = jnp.asarray(db.get_farthest_3d(args.cls, args.num_keypoints),
                           jnp.float32)
        model_pts = jnp.asarray(verts)
        facesj = jnp.asarray(faces)

    if args.mode == 'heatmap':
        model = resnet18_8s(ver_dim=args.num_keypoints)
    else:
        model = ResNet8s2o(ver_dim=2 * args.num_keypoints, seg_dim=2,
                           depth=18, fc_dim=128, s8_dim=64, s4_dim=32,
                           s2_dim=32, raw_dim=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    params, batch_stats = variables['params'], variables['batch_stats']
    # cosine decay to ~0 over the run (the reference steps lr/10 at fixed
    # epochs, main.py:223-234; a smooth schedule converges the slower
    # vertex-field head without tuning step epochs per run length)
    total_steps = max(args.epochs * args.steps_per_epoch, 1)
    tx = optax.adam(optax.cosine_decay_schedule(args.lr, total_steps, 0.01))
    opt_state = tx.init(params)

    logger = TsvLogger(os.path.join(args.workdir, f'log_{args.cls}.txt'),
                       resume=True)  # a crash restart must append, not wipe
    logger.set_names(['Epoch', 'LR', 'Train Loss'])
    events = JsonlLogger(os.path.join(args.workdir, 'events.jsonl'))

    # last/best_add checkpoints + crash resume (reference net_<cls>/
    # convention, main.py:176-204; without this a multi-hour real-data
    # run's weights died with the process)
    ckpt = CheckpointManager(os.path.join(args.workdir, f'net_{args.cls}'))
    st0, begin_epoch = ckpt.restore(
        'last', _CkptState(params, batch_stats, opt_state))
    params, batch_stats, opt_state = (st0.params, st0.batch_stats,
                                      st0.opt_state)
    if begin_epoch:
        print(f'resumed from epoch {begin_epoch}')
    # resume-safe best gate: seeded from the sidecar so a restart cannot
    # clobber best_add with worse weights on its first eval
    best_scores = ckpt.load_best()
    best_add = best_scores.get('best_add', -1.0)

    def batch_inputs(batch):
        src = batch.get('image', batch['mask'])
        return jnp.repeat(src[..., None], 3, axis=-1)

    @jax.jit
    def step(params, batch_stats, opt_state, batch, key):
        img = batch_inputs(batch)

        def loss_fn(p):
            out, mut = model.apply({'params': p, 'batch_stats': batch_stats},
                                   img, train=True, mutable=['batch_stats'])
            if args.mode == 'heatmap':
                hm, wm = heatmap_ops.render_targets(batch['keypoints_2d'],
                                                    size, size, 2.0)
                loss = weighted_heatmap_loss(
                    out, jnp.transpose(hm, (0, 2, 3, 1)),
                    jnp.transpose(wm, (0, 2, 3, 1)))
            else:
                seg, vert = out
                target = vertex_ops.vertex_field(batch['mask'],
                                                 batch['keypoints_2d'])
                loss = pvnet_loss(seg, vert, batch['mask'], target)
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), mut['batch_stats'],
                opt_state, loss)

    key = jax.random.PRNGKey(args.seed)
    result = {}

    if use_real:
        real_step = make_real_step(model, args.mode, size,
                                   args.num_keypoints, tx,
                                   augment=args.augment)
        for epoch in range(begin_epoch, args.epochs):
            loader = linemod_data.LinemodBatchLoader(
                train_records, args.image_root, args.cls, args.batch_size,
                shuffle=True, seed=args.seed + epoch,
                frame_hw=(args.frame_h, args.frame_w))
            losses = []
            for bi, batch in enumerate(loader):
                params, batch_stats, opt_state, loss = real_step(
                    params, batch_stats, opt_state,
                    jnp.asarray(batch['frame']), jnp.asarray(batch['bbox']),
                    jnp.asarray(batch['keypoints_2d']),
                    jnp.asarray(batch['mask']),
                    jax.random.fold_in(key, epoch * 100003 + bi))
                losses.append(float(loss))
            logger.append([epoch + 1, args.lr, float(np.mean(losses))])
            print(f'{args.cls} epoch {epoch + 1}: '
                  f'loss {np.mean(losses):.5f}')
            eval_loader = linemod_data.LinemodBatchLoader(
                test_records, args.image_root, args.cls,
                min(args.batch_size, len(test_records)), shuffle=False,
                drop_last=False, frame_hw=(args.frame_h, args.frame_w))
            result = evaluate_real(model, params, batch_stats, eval_loader,
                                   db, args.cls, args.mode, size,
                                   args.num_keypoints,
                                   jax.random.fold_in(key, 555 + epoch))
            events.log('eval', epoch=epoch + 1, **result)
            print(f"  2D-proj {result['projection_2d']:.3f}  "
                  f"ADD {result['add']:.3f}  "
                  f"5cm5deg {result['cm_degree_5']:.3f}")
            ckpt.save('last', _CkptState(params, batch_stats, opt_state),
                      epoch)
            if result['add'] > best_add:
                best_add = result['add']
                ckpt.save('best_add',
                          _CkptState(params, batch_stats, opt_state), epoch)
                ckpt.store_best({**best_scores, 'best_add': best_add})

        if args.occ_pkl_dir:
            # OCCLUSION_LINEMOD eval (result_show.py:95-98,378 parity)
            occ_records = linemod_data.load_occlusion_records(
                args.occ_pkl_dir, args.cls)
            occ_loader = linemod_data.LinemodBatchLoader(
                occ_records, args.occ_image_root or args.image_root,
                args.cls, min(args.batch_size, len(occ_records)),
                shuffle=False, drop_last=False,
                frame_hw=(args.frame_h, args.frame_w))
            occ = evaluate_real(model, params, batch_stats, occ_loader, db,
                                args.cls, args.mode, size,
                                args.num_keypoints,
                                jax.random.fold_in(key, 777))
            result.update({f'occ_{k}': v for k, v in occ.items()})
            events.log('occ_eval', **occ)
            with open(os.path.join(args.workdir, 'occ_result.txt'),
                      'a') as fi:
                fi.write(f"{args.cls}\t{occ['projection_2d']:.6f}\t"
                         f"{occ['add']:.6f}\t{occ['cm_degree_5']:.6f}\n")
            print(f"  occlusion: 2D-proj {occ['projection_2d']:.3f}  "
                  f"ADD {occ['add']:.3f}  "
                  f"5cm5deg {occ['cm_degree_5']:.3f}")
        logger.close()
        events.close()
        return result

    # Fused epoch: data generation is on-device, so the whole epoch
    # (render batch -> step, x steps_per_epoch) runs as ONE lax.scan
    # dispatch and the host syncs once on the per-step loss vector.
    # Through a remote-TPU tunnel the previous per-step float(loss)
    # cost a ~0.7 s round-trip per step.  Key stream fold_in(key,
    # epoch*10000 + j) is identical to the per-step loop's.
    @partial(jax.jit, static_argnames=('n_steps',))
    def scan_epoch(params, batch_stats, opt_state, base, n_steps):
        def body(carry, j):
            p, bs, op = carry
            bkey = jax.random.fold_in(key, base + j)
            batch = synthetic_linemod_batch(bkey, args.batch_size, db,
                                            model_pts, facesj, kp3d, size)
            p, bs, op, loss = step(p, bs, op, batch, bkey)
            return (p, bs, op), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(n_steps))
        return params, batch_stats, opt_state, losses

    for epoch in range(begin_epoch, args.epochs):
        params, batch_stats, opt_state, losses = scan_epoch(
            params, batch_stats, opt_state, jnp.int32(epoch * 10000),
            args.steps_per_epoch)
        losses = np.asarray(losses)
        logger.append([epoch + 1, args.lr, float(np.mean(losses))])
        print(f'{args.cls} epoch {epoch + 1}: loss {np.mean(losses):.5f}')

        # eval: pose metrics through the full decode stack, over
        # ``--eval-batches`` held-out batches (metric granularity
        # 1/(eval_batches*batch_size))
        accs = []
        for j in range(args.eval_batches):
            ebatch = synthetic_linemod_batch(
                jax.random.fold_in(key, 999999 + j), args.batch_size, db,
                model_pts, facesj, kp3d, size)
            out = model.apply({'params': params, 'batch_stats': batch_stats},
                              batch_inputs(ebatch), train=False)
            Kc = ebatch['K']
            if args.mode == 'heatmap':
                hm = jnp.transpose(out, (0, 3, 1, 2))
                coords, maxvals = peak_ops.decode_heatmaps(hm)
                res = pnp_mod.ransac_epnp(
                    jnp.broadcast_to(kp3d, (args.batch_size,) + kp3d.shape),
                    coords, Kc, jax.random.PRNGKey(3))
                R_pred, t_pred = res.R, res.t
            else:
                seg, vert = out
                seg_mask = (jnp.argmax(seg, axis=-1) == 1).astype(jnp.float32)
                field = vert.reshape(vert.shape[:3] +
                                     (args.num_keypoints, 2))
                vres = voting_ops.ransac_voting(seg_mask, field,
                                                jax.random.PRNGKey(4))
                # Reference eval path (evaluation.py:471-508): covariance is
                # estimated AROUND the voting winners with the looser 0.99
                # threshold (ransac_voting_gpu.py:333-406) and feeds
                # covariance-weighted PnP.
                kp_mean, kp_cov = \
                    voting_ops.estimate_voting_distribution_with_mean(
                        seg_mask, field, vres.keypoints, jax.random.PRNGKey(6))
                R_pred, t_pred = pnp_mod.uncertainty_pnp(
                    jnp.broadcast_to(kp3d, (args.batch_size,) + kp3d.shape),
                    kp_mean, kp_cov, Kc, jax.random.PRNGKey(5))
            accs.append(evaluator.pose_accuracy(
                model_pts, db.get_diameter(args.cls), Kc,
                R_pred, t_pred, ebatch['R'], ebatch['t'],
                symmetric=db.is_symmetric(args.cls)))
        result = {k: float(np.mean([float(a[k]) for a in accs]))
                  for k in accs[0]}
        events.log('eval', epoch=epoch + 1, **result)
        print(f"  2D-proj {result['projection_2d']:.3f}  "
              f"ADD {result['add']:.3f}  5cm5deg {result['cm_degree_5']:.3f}")
        ckpt.save('last', _CkptState(params, batch_stats, opt_state), epoch)
        if result['add'] > best_add:
            best_add = result['add']
            ckpt.save('best_add',
                      _CkptState(params, batch_stats, opt_state), epoch)
            ckpt.store_best({**best_scores, 'best_add': best_add})
    logger.close()
    events.close()
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--workdir', default='runs/linemod')
    ap.add_argument('--cls', default='cat')
    ap.add_argument('--mode', choices=['heatmap', 'pvnet'], default='heatmap')
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--steps-per-epoch', type=int, default=50)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--crop-size', type=int, default=128)
    ap.add_argument('--num-keypoints', type=int, default=9)
    ap.add_argument('--lr', type=float, default=1e-3)
    ap.add_argument('--seed', type=int, default=0)
    # real-data (data2/ pickle layout) options
    ap.add_argument('--pkl-dir', default=None,
                    help='directory of {cls}_{real,train,test,fuse,render}'
                         '.pkl (data_load3.py:89-121 layout)')
    ap.add_argument('--image-root', default='',
                    help='root for rgb_pth/dpt_pth record paths')
    ap.add_argument('--ply', default=None,
                    help='object mesh for ADD metrics (else the record '
                         'sift_3d cloud is used)')
    ap.add_argument('--augment', action='store_true',
                    help='real-data path: run the PVNet training '
                         'augmentation chain (occlusion mask-out, instance '
                         'rotation, crop_resize_instance_v2 scale/window '
                         'jitter, flip, add_noise) on-device per batch '
                         '(linemod_dataset.py:256-293 parity)')
    ap.add_argument('--no-fuse', dest='use_fuse', action='store_false')
    ap.add_argument('--no-render', dest='use_render', action='store_false')
    ap.add_argument('--frame-h', type=int, default=480)
    ap.add_argument('--frame-w', type=int, default=640)
    ap.add_argument('--occ-pkl-dir', default=None,
                    help='pkl dir containing occ/{cls}_real.pkl '
                         '(OCCLUSION_LINEMOD eval, result_show.py:95-98)')
    ap.add_argument('--occ-image-root', default=None)
    ap.add_argument('--eval-batches', type=int, default=1,
                    help='synthetic mode: held-out eval batches per epoch '
                         '(metric granularity 1/(N*batch_size))')
    args = ap.parse_args(argv)
    return train(args)


if __name__ == '__main__':
    main()
