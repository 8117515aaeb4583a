"""Torch-checkpoint weight import (utils/torch_import.py).

Round-trip and functional-golden tests on small fixtures:

* HRNet: export -> import round trip over the full tiny tree (every plan
  path must exist in the real flax tree, every exported key must be
  consumed on re-import);
* functional parity of an imported net against a torch-functional forward
  built directly from the fixture state_dict (oracle implements the
  documented reference semantics with torch.nn.functional — stem conv+BN,
  dilated ResNet backbone);
* the head's conv-bias -> BN-running-mean folding rule;
* RGB->grayscale kernel adaptation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esa_pose_estimation_tpu.models import HRNet
from esa_pose_estimation_tpu.models.resnet8s import ResNetBackbone8s
from esa_pose_estimation_tpu.utils import config as cfg_mod
from esa_pose_estimation_tpu.utils.torch_import import (
    export_reference_hrnet,
    hrnet_plan,
    import_reference_hrnet,
    import_torchvision_resnet,
    resnet_plan,
)

torch = pytest.importorskip('torch')


def _init(model, shape):
    rng = jax.random.PRNGKey(0)
    return model.init(rng, jnp.zeros(shape), train=False)


# ---------------------------------------------------------------------------
# HRNet round trip
# ---------------------------------------------------------------------------

def test_hrnet_export_import_round_trip():
    cfg = cfg_mod.hrnet_tiny()
    model = HRNet(cfg)
    variables = _init(model, (1, 32, 32, 1))

    # Randomize so the round trip can't pass on init symmetry.
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), variables)

    sd = export_reference_hrnet(variables, cfg)
    assert any(k.startswith('stage2.0.fuse_layers') for k in sd)
    assert 'last_layer.0.bias' in sd           # folded bias slot exported

    restored = import_reference_hrnet(
        jax.tree.map(jnp.zeros_like, variables), sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_hrnet_plan_covers_every_conv_and_bn():
    """Every conv kernel and BN leaf of the flax tree is written by the
    plan (nothing silently left at init)."""
    cfg = cfg_mod.hrnet_tiny()
    variables = _init(HRNet(cfg), (1, 32, 32, 1))
    zeroed = jax.tree.map(jnp.zeros_like, variables)
    sd = export_reference_hrnet(
        jax.tree.map(lambda a: jnp.full(a.shape, 7.0, a.dtype), variables),
        cfg)
    out = import_reference_hrnet(zeroed, sd, cfg)
    for path, leaf in jax.tree_util.tree_leaves_with_path(out):
        assert np.all(np.asarray(leaf) != 0.0), jax.tree_util.keystr(path)


def test_hrnet_import_strict_rejects_unknown_keys():
    cfg = cfg_mod.hrnet_tiny()
    variables = _init(HRNet(cfg), (1, 32, 32, 1))
    sd = export_reference_hrnet(variables, cfg)
    sd['stage9.bogus.weight'] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match='unconsumed'):
        import_reference_hrnet(variables, sd, cfg)
    # num_batches_tracked bookkeeping is tolerated
    del sd['stage9.bogus.weight']
    sd['bn1.num_batches_tracked'] = np.zeros((), np.int64)
    import_reference_hrnet(variables, sd, cfg)


# ---------------------------------------------------------------------------
# Functional parity vs torch oracles
# ---------------------------------------------------------------------------

def test_stem_conv_bn_matches_torch():
    """Imported stem: flax conv+BN(inference) == torch functional
    conv2d+batch_norm on the same weights."""
    cfg = cfg_mod.hrnet_tiny()
    model = HRNet(cfg)
    variables = _init(model, (1, 16, 16, 1))

    tw = torch.randn(cfg.stem_channels, 1, 3, 3)
    g = torch.rand(cfg.stem_channels) + 0.5
    b = torch.randn(cfg.stem_channels)
    mean = torch.randn(cfg.stem_channels)
    var = torch.rand(cfg.stem_channels) + 0.5
    sd = export_reference_hrnet(variables, cfg)
    sd.update({'conv1.weight': tw.numpy(), 'bn1.weight': g.numpy(),
               'bn1.bias': b.numpy(), 'bn1.running_mean': mean.numpy(),
               'bn1.running_var': var.numpy()})
    imported = import_reference_hrnet(variables, sd, cfg)

    x = torch.randn(2, 1, 16, 16)
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(x, tw, padding=1)
        ref = torch.nn.functional.batch_norm(ref, mean, var, g, b, eps=1e-5)

    def stem(variables, xin):
        p = variables['params']
        s = variables['batch_stats']
        y = jax.lax.conv_general_dilated(
            xin, jnp.asarray(p['stem_conv1']['kernel']), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        bn_p, bn_s = p['stem_bn1'], s['stem_bn1']
        return ((y - bn_s['mean']) / jnp.sqrt(bn_s['var'] + 1e-5)
                * bn_p['scale'] + bn_p['bias'])

    got = stem(imported, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-4)


def test_head_bias_folding_rule():
    """BN(conv(x) + bias) == folded import: running_mean' = mean - bias."""
    cfg = cfg_mod.hrnet_tiny()
    variables = _init(HRNet(cfg), (1, 32, 32, 1))
    sd = export_reference_hrnet(variables, cfg)

    # Give the first head conv a nonzero torch bias.
    cbias = np.random.default_rng(1).normal(
        size=sd['last_layer.0.bias'].shape).astype(np.float32)
    sd['last_layer.0.bias'] = cbias
    imported = import_reference_hrnet(variables, sd, cfg)
    got_mean = np.asarray(
        imported['batch_stats']['ConvBN_1']['BatchNorm_0']['mean'])
    want = sd['last_layer.1.running_mean'] - cbias
    np.testing.assert_allclose(got_mean, want, atol=1e-6)


def _torchvision_resnet18_sd(rng):
    """Hand-built state_dict with torchvision resnet18 naming/shapes
    (torchvision itself is not installed in this image)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f'{name}.weight'] = rng.normal(size=(o, i, k, k)).astype(
            np.float32) * 0.1

    def bn(name, c):
        sd[f'{name}.weight'] = (rng.random(c) + 0.5).astype(np.float32)
        sd[f'{name}.bias'] = rng.normal(size=c).astype(np.float32)
        sd[f'{name}.running_mean'] = rng.normal(size=c).astype(np.float32)
        sd[f'{name}.running_var'] = (rng.random(c) + 0.5).astype(np.float32)

    conv('conv1', 64, 3, 7)
    bn('bn1', 64)
    inpl = 64
    for li, (planes, blocks) in enumerate(((64, 2), (128, 2), (256, 2),
                                           (512, 2))):
        for bi in range(blocks):
            t = f'layer{li + 1}.{bi}'
            conv(f'{t}.conv1', planes, inpl if bi == 0 else planes, 3)
            bn(f'{t}.bn1', planes)
            conv(f'{t}.conv2', planes, planes, 3)
            bn(f'{t}.bn2', planes)
            if bi == 0 and inpl != planes:
                conv(f'{t}.downsample.0', planes, inpl, 1)
                bn(f'{t}.downsample.1', planes)
        inpl = planes
    return sd


def test_resnet18_backbone_import_matches_torch_forward():
    """Full imported backbone forward == a torch-functional forward of the
    same dilated architecture (resnet.py:116-221 semantics) built from the
    fixture state_dict."""
    rng = np.random.default_rng(2)
    sd = _torchvision_resnet18_sd(rng)

    model = ResNetBackbone8s(depth=18, fc_dim=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    imported = import_torchvision_resnet(variables, sd, depth=18, scope=())

    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)

    F = torch.nn.functional

    def tbn(name, v):
        return F.batch_norm(v, torch.tensor(sd[f'{name}.running_mean']),
                            torch.tensor(sd[f'{name}.running_var']),
                            torch.tensor(sd[f'{name}.weight']),
                            torch.tensor(sd[f'{name}.bias']), eps=1e-5)

    def tconv(name, v, stride=1, pad=1, dilation=1):
        return F.conv2d(v, torch.tensor(sd[f'{name}.weight']), stride=stride,
                        padding=pad, dilation=dilation)

    def tblock(t, v, stride, dilation, has_ds):
        out = F.relu(tbn(f'{t}.bn1', tconv(f'{t}.conv1', v, stride,
                                           dilation, dilation)))
        out = tbn(f'{t}.bn2', tconv(f'{t}.conv2', out, 1, dilation, dilation))
        res = v
        if has_ds:
            res = tbn(f'{t}.downsample.1',
                      tconv(f'{t}.downsample.0', v, stride, 0))
        return F.relu(out + res)

    with torch.no_grad():
        v = torch.tensor(x)
        v = F.relu(tbn('bn1', tconv('conv1', v, 2, 3)))
        x2s = v
        v = F.max_pool2d(v, 3, stride=2, padding=1)
        # output-stride-8 plan: (features, stride, dilation) per layer
        for li, (stride, dil) in enumerate(((1, 1), (2, 1), (1, 2), (1, 4))):
            for bi in range(2):
                t = f'layer{li + 1}.{bi}'
                has_ds = f'{t}.downsample.0.weight' in sd
                v = tblock(t, v, stride if bi == 0 else 1, dil, has_ds)
                if li == 0 and bi == 1:
                    x4s_ref = v
                if li == 1 and bi == 1:
                    x8s_ref = v

    x2s_j, x4s_j, x8s_j, _ = model.apply(
        imported, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(x2s_j).transpose(0, 3, 1, 2),
                               x2s.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x4s_j).transpose(0, 3, 1, 2),
                               x4s_ref.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(x8s_j).transpose(0, 3, 1, 2),
                               x8s_ref.numpy(), atol=2e-2, rtol=1e-3)


def test_grayscale_stem_adaptation():
    """3-channel ImageNet conv1 -> 1-channel stem: kernel summed over the
    input-channel axis; response to a grayscale image replicated to RGB
    is preserved exactly."""
    rng = np.random.default_rng(3)
    sd = _torchvision_resnet18_sd(rng)
    model = ResNetBackbone8s(depth=18, fc_dim=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                           train=False)
    imported = import_torchvision_resnet(variables, sd, depth=18, scope=())
    k = np.asarray(imported['params']['Conv_0']['kernel'])
    assert k.shape[2] == 1
    want = np.transpose(sd['conv1.weight'], (2, 3, 1, 0)).sum(2, keepdims=True)
    np.testing.assert_allclose(k, want, atol=1e-6)


def test_resnet_plan_key_count_matches_torchvision_layout():
    sd = _torchvision_resnet18_sd(np.random.default_rng(4))
    plan = resnet_plan(18)
    torch_keys = set()
    for kind, t, _ in plan:
        if kind == 'conv':
            torch_keys.add(f'{t}.weight')
        elif kind == 'bn':
            torch_keys.update(f'{t}.{s}' for s in
                              ('weight', 'bias', 'running_mean',
                               'running_var'))
    assert torch_keys == set(sd)


def test_hrnet_plan_paths_unique():
    """No flax path is written twice, and no torch conv prefix is mapped
    twice (guards against ordering bugs in the plan generators)."""
    for cfg in (cfg_mod.hrnet_tiny(), cfg_mod.hrnet_esa(),
                cfg_mod.hrnet_rgb32()):
        plan = hrnet_plan(cfg)
        fpaths = [f for _, _, f in plan]
        assert len(fpaths) == len(set(fpaths))
        convs = [t for kind, t, _ in plan if kind in ('conv', 'convb')]
        assert len(convs) == len(set(convs))
