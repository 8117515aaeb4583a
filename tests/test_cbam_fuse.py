"""Fused CBAM kernel (experimental/cbam_fuse.py) and its serving dispatch.

Off-TPU the kernel runs in the Pallas interpreter, so these tests verify
the exact math the TPU build executes (reference semantics:
seg_hrnet3.py:32-61 gates, :95-97 residual tail).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esa_pose_estimation_tpu.models import layers
from esa_pose_estimation_tpu.experimental.cbam_fuse import fused_cbam_pallas


def straightline(x, fc1, fc2, spw, res=None):
    """f32 textbook CBAM: channel gate, spatial gate, optional residual."""
    xf = x.astype(jnp.float32)
    avg = xf.mean(axis=(1, 2), keepdims=True)
    mx = xf.max(axis=(1, 2), keepdims=True)

    def mlp(v):
        h1 = jnp.maximum(jnp.einsum('bijc,ch->bijh', v, fc1), 0.0)
        return jnp.einsum('bijh,hc->bijc', h1, fc2)

    cg = jax.nn.sigmoid(mlp(avg) + mlp(mx))
    xg = xf * cg
    s = jnp.concatenate([xg.mean(axis=-1, keepdims=True),
                         xg.max(axis=-1, keepdims=True)], -1)
    sg = jax.nn.sigmoid(jax.lax.conv_general_dilated(
        s, spw[..., None], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    out = xg * sg
    if res is not None:
        out = jnp.maximum(out + res.astype(jnp.float32), 0.0)
    return out


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape, scale=scale), jnp.float32)


class TestFusedCbamKernel:

    @pytest.mark.parametrize('hwc', [(64, 64, 32), (32, 32, 64),
                                     (16, 16, 128), (8, 8, 256)])
    def test_matches_straightline(self, hwc):
        h, w, c = hwc
        hid = max(c // 16, 1)
        rng = np.random.default_rng(hash(hwc) % 2 ** 31)
        x = _rand(rng, (2, h, w, c))
        res = _rand(rng, (2, h, w, c))
        fc1 = _rand(rng, (c, hid), 0.3)
        fc2 = _rand(rng, (hid, c), 0.3)
        spw = _rand(rng, (7, 7, 2), 0.2)
        got = fused_cbam_pallas(x, fc1, fc2, spw, res, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(straightline(x, fc1, fc2,
                                                           spw, res)),
                                   atol=1e-5)

    def test_no_residual_no_relu(self):
        rng = np.random.default_rng(1)
        x = _rand(rng, (2, 16, 16, 32))
        fc1 = _rand(rng, (32, 2), 0.3)
        fc2 = _rand(rng, (2, 32), 0.3)
        spw = _rand(rng, (7, 7, 2), 0.2)
        got = fused_cbam_pallas(x, fc1, fc2, spw, None, interpret=True)
        want = straightline(x, fc1, fc2, spw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # negative values must survive (the head stem skip has no relu)
        assert float(jnp.min(got)) < 0


class TestCbamModuleDispatch:
    """layers.CBAM fused path == composite path on the same params."""

    def _apply_both(self, module, args, x, res):
        old = layers.FUSED_CBAM
        try:
            layers.FUSED_CBAM = False
            variables = module.init(jax.random.PRNGKey(0), x, res)
            slow = module.apply(variables, x, res)
            layers.FUSED_CBAM = True
            fast = module.apply(variables, x, res)
        finally:
            layers.FUSED_CBAM = old
        return slow, fast

    def test_cbam_with_residual(self):
        rng = np.random.default_rng(2)
        x = _rand(rng, (2, 16, 16, 64))
        res = _rand(rng, (2, 16, 16, 64))
        slow, fast = self._apply_both(layers.CBAM(), None, x, res)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5)

    def test_cbam_without_residual(self):
        rng = np.random.default_rng(3)
        x = _rand(rng, (2, 16, 16, 64))
        slow, fast = self._apply_both(layers.CBAM(), None, x, None)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5)

    def test_basic_block_eval_paths_agree(self):
        rng = np.random.default_rng(4)
        x = _rand(rng, (2, 16, 16, 32))
        blk = layers.BasicBlock(features=32)
        old = layers.FUSED_CBAM
        try:
            layers.FUSED_CBAM = False
            variables = blk.init(jax.random.PRNGKey(0), x, train=False)
            slow = blk.apply(variables, x, train=False)
            layers.FUSED_CBAM = True
            fast = blk.apply(variables, x, train=False)
        finally:
            layers.FUSED_CBAM = old
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5)

    def test_param_tree_unchanged(self):
        # round-1 checkpoints must keep loading: the fused path reads the
        # composite's exact param names
        x = jnp.zeros((1, 8, 8, 32))
        variables = layers.BasicBlock(features=32).init(
            jax.random.PRNGKey(0), x, train=False)
        p = variables['params']
        assert 'CBAM_0' in p
        assert set(p['CBAM_0']) == {'ChannelAttention_0',
                                    'SpatialAttention_0'}
        assert p['CBAM_0']['ChannelAttention_0']['Conv_0'][
            'kernel'].shape == (1, 1, 32, 2)
        assert p['CBAM_0']['SpatialAttention_0']['Conv_0'][
            'kernel'].shape == (7, 7, 2, 1)


def test_forced_fused_never_dispatches_under_training():
    """FUSED_CBAM=True left set (e.g. by a bench or a failed test
    teardown) must not route a TRAINING step through the Pallas kernel:
    it has no VJP, so value_and_grad would crash far from the toggle."""
    rng = np.random.default_rng(5)
    x = _rand(rng, (2, 8, 8, 32))
    res = _rand(rng, (2, 8, 8, 32))
    mod = layers.CBAM()
    variables = mod.init(jax.random.PRNGKey(0), x, res)
    old = layers.FUSED_CBAM
    try:
        layers.FUSED_CBAM = True

        def loss(params):
            out = mod.apply({'params': params}, x, res, train=True)
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss)(variables['params'])
    finally:
        layers.FUSED_CBAM = old
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
