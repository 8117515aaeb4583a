"""LINEMOD trainer smoke tests: both modes run end-to-end and the loss
decreases over a short run."""

import json
import os

import pytest


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['heatmap', 'pvnet'])
def test_linemod_trainer_loss_decreases(tmp_path, mode):
    from esa_pose_estimation_tpu.cli import train_linemod
    workdir = str(tmp_path / mode)
    train_linemod.main([
        '--workdir', workdir, '--mode', mode, '--epochs', '2',
        '--steps-per-epoch', '8', '--batch-size', '4',
        '--crop-size', '64', '--num-keypoints', '5', '--lr', '2e-3'])
    log = open(os.path.join(workdir, 'log_cat.txt')).read().strip().split('\n')
    losses = [float(line.split('\t')[2]) for line in log[1:]]
    assert losses[-1] < losses[0], losses
    events = [json.loads(line) for line in
              open(os.path.join(workdir, 'events.jsonl'))]
    assert any(e['event'] == 'eval' for e in events)


def test_synthetic_harness_well_posed():
    """The synthetic eval path recovers exact poses from ideal targets:
    heatmap mode (render -> decode -> EPnP) and pvnet mode (vertex field
    -> voting -> distribution -> uncertainty PnP) both score 1.0 on every
    LINEMOD metric, and the rendered input is pose-informative (images of
    distinct poses differ).  Guards the fix for the silhouette-symmetric
    harness (task was ill-posed: binary ellipsoid masks -> all metrics 0).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esa_pose_estimation_tpu.cli import train_linemod as tl
    from esa_pose_estimation_tpu.data.linemod import LineModModelDB
    from esa_pose_estimation_tpu.eval import evaluator
    from esa_pose_estimation_tpu.ops import heatmap as heatmap_ops
    from esa_pose_estimation_tpu.ops import peak as peak_ops
    from esa_pose_estimation_tpu.ops import pnp as pnp_mod
    from esa_pose_estimation_tpu.ops import vertex as vertex_ops
    from esa_pose_estimation_tpu.ops import voting as voting_ops

    db = LineModModelDB()
    verts, faces = tl.make_icosphere()
    db.register('cat', vertices=verts)
    kp3d = jnp.asarray(db.get_farthest_3d('cat', 7), jnp.float32)
    b = tl.synthetic_linemod_batch(jax.random.PRNGKey(2), 4, db,
                                   jnp.asarray(verts), jnp.asarray(faces),
                                   kp3d, 64)
    # shading makes the input pose-dependent beyond the silhouette
    imgs = np.asarray(b['image'])
    assert imgs.max() > 0.5
    assert not np.allclose(imgs[0], imgs[1])
    assert set(np.unique(np.asarray(b['mask']))) <= {0.0, 1.0}

    bs = b['mask'].shape[0]
    p3 = jnp.broadcast_to(kp3d, (bs,) + kp3d.shape)

    hm, _ = heatmap_ops.render_targets(b['keypoints_2d'], 64, 64, 2.0)
    coords, _ = peak_ops.decode_heatmaps(hm)
    res = pnp_mod.ransac_epnp(p3, coords, b['K'], jax.random.PRNGKey(3))
    acc = evaluator.pose_accuracy(jnp.asarray(verts),
                                  db.get_diameter('cat'), b['K'],
                                  res.R, res.t, b['R'], b['t'],
                                  symmetric=False)
    assert float(acc['projection_2d']) == 1.0
    assert float(acc['add']) == 1.0

    field = vertex_ops.vertex_field(b['mask'], b['keypoints_2d'])
    vres = voting_ops.ransac_voting(b['mask'], field, jax.random.PRNGKey(4))
    kp_mean, kp_cov = voting_ops.estimate_voting_distribution_with_mean(
        b['mask'], field, vres.keypoints, jax.random.PRNGKey(6))
    R_pred, t_pred = pnp_mod.uncertainty_pnp(p3, kp_mean, kp_cov, b['K'],
                                             jax.random.PRNGKey(5))
    acc = evaluator.pose_accuracy(jnp.asarray(verts),
                                  db.get_diameter('cat'), b['K'],
                                  R_pred, t_pred, b['R'], b['t'],
                                  symmetric=False)
    assert float(acc['projection_2d']) == 1.0
    assert float(acc['add']) == 1.0
