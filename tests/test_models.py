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


class TestMergedFuse:
    """The eval-time fuse-layer conv merge (models/hrnet.py:MERGED_FUSE)
    must be numerically identical to the composite path: per-path BN
    affines are folded into the conv kernels and kernels sharing a source
    branch concatenate along the output-channel axis — exact math, same
    parameter tree."""

    def _randomized(self, variables, key):
        """Randomize params AND BN running stats so the fold is
        non-trivial (fresh-init stats are mean 0 / var 1)."""
        leaves, tree = jax.tree.flatten(variables)
        keys = jax.random.split(key, len(leaves))
        out = []
        for leaf, k in zip(leaves, keys):
            r = jax.random.normal(k, leaf.shape, leaf.dtype) * 0.3
            if leaf.ndim == 1:  # scale/var must stay positive-ish
                r = jnp.abs(r) + 0.5
            out.append(r.astype(leaf.dtype))
        return jax.tree.unflatten(tree, out)

    def test_fuse_layer_merged_matches_composite(self):
        from esa_pose_estimation_tpu.models import hrnet as hr
        layer = hr.FuseLayer(4, (8, 16, 32, 64))
        xs = [jax.random.normal(jax.random.PRNGKey(10 + i),
                                (2, 32 // 2**i, 32 // 2**i, (8, 16, 32, 64)[i]))
              for i in range(4)]
        variables = layer.init(jax.random.PRNGKey(0), xs, train=False)
        variables = self._randomized(variables, jax.random.PRNGKey(1))
        old = hr.MERGED_FUSE
        try:
            hr.MERGED_FUSE = False
            ref = layer.apply(variables, xs, train=False)
            hr.MERGED_FUSE = True
            got = layer.apply(variables, xs, train=False)
        finally:
            hr.MERGED_FUSE = old
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5, err_msg=str(i))

    def test_full_net_merged_matches_composite(self, tiny_net=None):
        from esa_pose_estimation_tpu.models import hrnet as hr
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        variables = self._randomized(variables, jax.random.PRNGKey(3))
        old = hr.MERGED_FUSE
        try:
            hr.MERGED_FUSE = False
            ref = model.apply(variables, x, train=False)
            hr.MERGED_FUSE = True
            got = model.apply(variables, x, train=False)
        finally:
            hr.MERGED_FUSE = old
        ref, got = np.asarray(ref), np.asarray(got)
        # Randomized BN stats make activations explode to ~1e5 through the
        # deep net; compare at the output's own scale (the merge only
        # reorders f32 summation/fusion, so error is relative to magnitude).
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale,
                                   rtol=1e-4, atol=1e-5)

    def test_train_path_never_merges(self):
        """The merged fold is only exact for frozen BN statistics; the
        training path must keep the composite even when forced."""
        from esa_pose_estimation_tpu.models import hrnet as hr
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        old = hr.MERGED_FUSE
        try:
            hr.MERGED_FUSE = True
            out, _ = model.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
        finally:
            hr.MERGED_FUSE = old
        assert out.shape == (2, 64, 64, cfg.num_keypoints)


class TestInt8Serving:
    """layers.INT8_SERVING: the int8 head-conv path must track the f32
    composite to quantization noise at eval, and never engage in
    training (dynamic-quant rounding has no useful gradient and BN must
    see real batch statistics)."""

    def test_eval_path_tracks_composite(self):
        from esa_pose_estimation_tpu.models import layers
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
        variables = jax.jit(model.init, static_argnames=('train',))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
        ref = np.asarray(model.apply(variables, x, train=False))
        old = layers.INT8_SERVING
        try:
            layers.INT8_SERVING = True
            out = np.asarray(model.apply(variables, x, train=False))
        finally:
            layers.INT8_SERVING = old
        scale = max(float(np.abs(ref).max()), 1.0)
        assert float(np.abs(out - ref).max()) < 0.05 * scale

    def test_train_path_never_quantizes(self):
        from esa_pose_estimation_tpu.models import layers
        cfg = cfg_mod.hrnet_tiny()
        model = HRNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        old = layers.INT8_SERVING
        try:
            layers.INT8_SERVING = True
            out, _ = model.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
        finally:
            layers.INT8_SERVING = old
        assert out.shape == (2, 32, 32, cfg.num_keypoints)
        assert bool(jnp.isfinite(out).all())
