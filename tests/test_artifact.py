"""Portable inference artifact (utils/artifact.py): npz round trip must
reproduce the checkpoint's forward pass to bf16 precision, and the
flatten/unflatten must preserve arbitrary nesting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.models import HRNet
from esa_pose_estimation_tpu.train import state as state_mod
from esa_pose_estimation_tpu.utils import artifact
from esa_pose_estimation_tpu.utils import config as cfg_mod


def test_flatten_roundtrip():
    tree = {'a': {'b': np.ones((2,)), 'c': {'d': np.zeros((1, 3))}},
            'e': np.full((2, 2), 7.0)}
    flat = artifact._flatten(tree)
    assert set(flat) == {'a/b', 'a/c/d', 'e'}
    rebuilt = artifact._unflatten(flat)
    assert rebuilt['a']['c']['d'].shape == (1, 3)
    np.testing.assert_array_equal(rebuilt['e'], tree['e'])


def test_artifact_reproduces_forward(tmp_path):
    model = HRNet(cfg_mod.hrnet_tiny(), dtype=jnp.bfloat16)
    st = state_mod.create_train_state(
        model, cfg_mod.TrainConfig(crop_size=32), jax.random.PRNGKey(3),
        (1, 32, 32, 1))
    path = str(tmp_path / 'net.npz')
    artifact.save_inference_artifact(
        path, jax.device_get(st.params), jax.device_get(st.batch_stats),
        meta={'model': 'hrnet_tiny', 'epoch': 4})
    assert os.path.getsize(path) > 0

    variables, meta = artifact.load_inference_artifact(path)
    assert meta == {'model': 'hrnet_tiny', 'epoch': 4}

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
    ref = model.apply({'params': st.params,
                       'batch_stats': st.batch_stats}, x, train=False)
    out = model.apply(variables, x, train=False)
    # params went f32 -> bf16 -> f32: outputs agree to bf16 rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.02)
    # batch_stats survive exactly (stored f32)
    flat_a = artifact._flatten(jax.device_get(st.batch_stats))
    flat_b = artifact._flatten(
        jax.tree_util.tree_map(np.asarray, variables['batch_stats']))
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
