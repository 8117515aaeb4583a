"""Model tests: shapes, parameter counts, dtype flow, variant topologies.

Mirrors the reference's shape-fuzz idiom (net.py:333-342) plus parameter
count cross-checks against the torch reference architecture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esa_pose_estimation_tpu.models import HRNet, resnet18_8s
from esa_pose_estimation_tpu.utils import config as cfg_mod


def param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


class TestHRNet:
    @pytest.fixture(scope='class')
    def tiny(self):
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg)
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 1)), train=False)
        return model, variables

    def test_output_shape(self, tiny):
        model, variables = tiny
        out = model.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False)
        assert out.shape == (2, 64, 64, 6)
        assert out.dtype == jnp.float32

    def test_shape_fuzz(self, tiny):
        # reference net.py:333-342 idiom: multiple input sizes, including
        # ODD sizes (the head used to upsample to 2*ceil(H/2), emitting
        # one extra row/col for odd inputs)
        model, variables = tiny
        for hw in (32, 64, 96, 33, 127):
            out = model.apply(variables, jnp.zeros((1, hw, hw, 1)),
                              train=False)
            assert out.shape == (1, hw, hw, 6), hw

    def test_train_mode_updates_batch_stats(self, tiny):
        model, variables = tiny
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1))
        out, mutated = model.apply(variables, x, train=True,
                                   mutable=['batch_stats'])
        before = jax.tree.leaves(variables['batch_stats'])
        after = jax.tree.leaves(mutated['batch_stats'])
        changed = any(not np.allclose(a, b) for a, b in zip(before, after))
        assert changed

    def test_flagship_param_count(self):
        # Full ESA config (seg_hrnet3 + config/default.py topology).
        # The torch reference counts ~9.6M parameters; conv-bias removal
        # under BN keeps us within a few percent.
        model = HRNet(cfg_mod.hrnet_esa())
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 1)), train=False))
        n = param_count(variables['params'])
        assert 8.0e6 < n < 11.5e6, n

    def test_bfloat16_compute(self, tiny):
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), train=False)
        # params stay f32
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(variables['params']))
        out = model.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.dtype == jnp.float32

    def test_variant_topologies(self):
        for factory, in_ch, out_ch in [
            (cfg_mod.hrnet_rgb32, 3, 32),
            (cfg_mod.hrnet_gray11, 1, 11),
        ]:
            cfg = factory()
            shapes = jax.eval_shape(
                lambda cfg=cfg, in_ch=in_ch: HRNet(cfg).init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, in_ch)),
                    train=False))
            assert shapes['params'] is not None
            out = jax.eval_shape(
                lambda v, cfg=cfg, in_ch=in_ch: HRNet(cfg).apply(
                    v, jnp.zeros((1, 64, 64, in_ch)), train=False), shapes)
            assert out.shape == (1, 64, 64, out_ch)


class TestResNet8s:
    def test_output_shape(self):
        model = resnet18_8s(ver_dim=32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 64, 64, 32)

    def test_param_count_near_reference(self):
        # torch Resnet18_8s(ver_dim=32) has ~12.9M params
        model = resnet18_8s(ver_dim=32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))
        n = param_count(variables['params'])
        assert 11e6 < n < 15e6, n

    def test_detector_heads(self):
        """Objectness-head variants (model_repository.py:302-330):
        both taps emit (B, H/8, W/8, 1) logits."""
        from esa_pose_estimation_tpu.models.resnet8s import ResNet8sDetector
        for tap in ('fc', '8s'):
            model = ResNet8sDetector(depth=18, tap=tap)
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), train=False)
            out = model.apply(variables, jnp.zeros((2, 64, 64, 3)),
                              train=False)
            assert out.shape == (2, 8, 8, 1), tap
