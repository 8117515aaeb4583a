"""Multi-device serving: the inference pipeline sharded over the mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from esa_pose_estimation_tpu import pipeline
from esa_pose_estimation_tpu.data import synthetic
from esa_pose_estimation_tpu.models import HRNet
from esa_pose_estimation_tpu.parallel import make_mesh
from esa_pose_estimation_tpu.utils import config as cfg_mod


def test_pipeline_shards_over_data_axis():
    mesh = make_mesh(8)
    pts = synthetic.spacecraft_points(6)
    model = HRNet(cfg_mod.hrnet_tiny())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), train=False)

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P('data'))

    fn = jax.jit(
        lambda v, f, b, k: pipeline.infer_poses(
            model, v, f, b, pts, k, crop_size=64, n_hypotheses=8,
            lm_iters=3),
        in_shardings=(rep, dat, dat, rep),
    )

    frames = jax.device_put(jnp.zeros((16, 256, 256)), dat)
    bboxes = jax.device_put(
        jnp.tile(jnp.asarray([[10.0, 10, 200, 200]]), (16, 1)), dat)
    variables = jax.device_put(variables, rep)
    out = fn(variables, frames, bboxes, jax.random.PRNGKey(1))
    assert out.quat.shape == (16, 4)
    assert np.isfinite(np.asarray(out.trans)).all()
    # outputs actually live distributed across all 8 devices
    assert len(out.trans.sharding.device_set) == 8


def test_sharded_eval_step_runs_and_shards_output():
    """make_sharded_eval_step: replicated state + data-sharded batch ->
    data-sharded heatmaps and a replicated finite loss."""
    from esa_pose_estimation_tpu.parallel import replicate, shard_batch
    from esa_pose_estimation_tpu.train import state as state_mod

    mesh = make_mesh(n_data=8, n_model=1)
    cfg = cfg_mod.TrainConfig(batch_size=16, crop_size=32)
    model = HRNet(cfg_mod.hrnet_tiny())
    st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      (1, 32, 32, 1))
    pts = synthetic.spacecraft_points(6)
    batch = synthetic.make_batch(jax.random.PRNGKey(1), 16, pts,
                                 crop_size=32)
    batch = {k: batch[k] for k in ('image', 'heatmaps', 'weights')}

    step = state_mod.make_sharded_eval_step(mesh)
    st = replicate(st, mesh)
    out, loss = step(st, shard_batch(batch, mesh))
    assert np.isfinite(float(loss))
    assert out.shape[0] == 16
    # output batch axis is sharded over the 8-device data axis
    assert len(out.sharding.device_set) == 8


def test_train_step_with_model_axis_2():
    """A (4, 2) mesh with param_sharding: the head kernels (and their Adam
    moments) are genuinely split over the 'model' axis, the step runs, and
    the loss is finite — the provisioned model axis exercised end to end."""
    from esa_pose_estimation_tpu.parallel import param_sharding, shard_batch
    from esa_pose_estimation_tpu.train import state as state_mod

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = cfg_mod.TrainConfig(batch_size=8, crop_size=32)
    model = HRNet(cfg_mod.hrnet_tiny())
    st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      (1, 32, 32, 1))
    shardings = param_sharding(st, mesh)
    # the sharding rule must actually split something (the tiny head
    # convs are 3x3x120x120 > the size threshold)
    n_split = sum(int(not s.is_fully_replicated)
                  for s in jax.tree.leaves(shardings))
    assert n_split >= 3   # param + both Adam moments at minimum
    st = jax.tree.map(jax.device_put, st, shardings)
    # a split leaf really lives in pieces across the model axis
    split_leaf = [x for x, s in zip(jax.tree.leaves(st),
                                    jax.tree.leaves(shardings))
                  if not s.is_fully_replicated][0]
    assert len(split_leaf.sharding.device_set) == 8

    pts = synthetic.spacecraft_points(6)
    batch = synthetic.make_batch(jax.random.PRNGKey(1), 8, pts,
                                 crop_size=32)
    batch = {k: batch[k] for k in ('image', 'heatmaps', 'weights')}
    step = state_mod.make_sharded_train_step(mesh, state=st)
    st, metrics = step(st, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics['loss']))


def test_make_mesh_rejects_under_subscription():
    """An explicit factorization that idles devices must raise (silently
    unused chips read as a throughput regression); a deliberate sub-mesh
    passes the device subset explicitly."""
    import pytest

    with pytest.raises(ValueError, match='of 8 devices'):
        make_mesh(n_data=2, n_model=2)
    sub = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    assert sub.devices.shape == (2, 2)
