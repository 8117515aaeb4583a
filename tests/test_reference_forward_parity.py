"""End-to-end forward parity against the ACTUAL reference network.

Constructs the reference ``HighResolutionNet`` (models/seg_hrnet3.py:301-542)
from the reference checkout with randomized weights + BN statistics, imports
its ``state_dict`` through :func:`utils.torch_import.import_reference_hrnet`,
and asserts the Flax HRNet produces the same output map.  This pins, in one
test, every architectural parity claim at once: stem wiring, CBAM placement
and gate math, transition/fuse conv ordering, both bilinear-resize
conventions (align_corners=False in fuse, =True in the head), head bias
folding, and the pre-BN stem skip.

Skipped when the reference checkout is absent (the test *verifies against*
the reference, it does not depend on it for the framework to work).
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

REF_PATH = '/root/reference/models/seg_hrnet3.py'

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason='reference checkout not available')


class _AttrDict(dict):
    """Minimal yacs-like node: the reference net reads its config both as
    a mapping (extra['STAGE1']) and by attribute (extra.FINAL_CONV_KERNEL)."""

    def __getattr__(self, k):
        return self[k]


def _stage(modules, branches, blocks, channels, block='BASIC'):
    return {'NUM_MODULES': modules, 'NUM_BRANCHES': branches,
            'NUM_BLOCKS': list(blocks), 'NUM_CHANNELS': list(channels),
            'BLOCK': block, 'FUSE_METHOD': 'SUM'}


def _load_reference_module():
    spec = importlib.util.spec_from_file_location('ref_seg_hrnet3', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_reference_net(mod, extra_cfg):
    import torch
    cfg = _AttrDict(MODEL=_AttrDict(EXTRA=_AttrDict(
        HIGH_RESOLUTION_NET=_AttrDict(extra_cfg))))
    # the reference calls the long-removed np.int alias at construction
    # (seg_hrnet3.py:357); shim it for the duration of the build only
    had = hasattr(np, 'int')
    if not had:
        np.int = int
    try:
        net = mod.HighResolutionNet(cfg)
    finally:
        if not had:
            del np.int
    torch.manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            p.uniform_(-0.15, 0.15)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                # randomize running stats too: a swapped mean/var mapping
                # or a missed head bias-fold would pass with 0/1 defaults
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_flax_hrnet_matches_reference_forward():
    import torch

    import jax
    import jax.numpy as jnp

    from esa_pose_estimation_tpu.models.hrnet import HRNet
    from esa_pose_estimation_tpu.utils.config import HRNetConfig, StageConfig
    from esa_pose_estimation_tpu.utils.torch_import import (
        import_reference_hrnet,
    )

    # Flagship topology shrunk (fewer blocks, thinner branches) but
    # exercising every structural element: BOTTLENECK stage-1 WITH a
    # downsample (128 != stem 64), a 2-module stage, 4 fused branches,
    # CBAM everywhere, the attended stem skip, and both head convs.
    # Channels stay >=16 so the reference's C//16 attention MLP is valid.
    extra = {
        'FINAL_CONV_KERNEL': 1,
        'STAGE1': _stage(1, 1, (1,), (32,), 'BOTTLENECK'),
        'STAGE2': _stage(1, 2, (1, 1), (16, 32)),
        'STAGE3': _stage(2, 3, (1, 1, 1), (16, 32, 64)),
        'STAGE4': _stage(1, 4, (1, 1, 1, 1), (16, 32, 64, 128)),
    }
    cfg = HRNetConfig(
        stage1=StageConfig(1, 1, (1,), (32,), 'BOTTLENECK'),
        stage2=StageConfig(1, 2, (1, 1), (16, 32)),
        stage3=StageConfig(2, 3, (1, 1, 1), (16, 32, 64)),
        stage4=StageConfig(1, 4, (1, 1, 1, 1), (16, 32, 64, 128)),
    )

    net = _build_reference_net(_load_reference_module(), extra)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert ref.shape == (1, 32, 32, 30)

    model = HRNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 1)), train=False)
    sd = {k: v for k, v in net.state_dict().items()}
    variables = import_reference_hrnet(variables, sd, cfg, strict=True)
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    # guard against a vacuous pass (e.g. both nets emitting ~0 maps)
    assert np.abs(ref).max() > 1e-3
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def _load_reference_net_module():
    """Load reference ``net.py`` with its sibling ``resnet.py`` resolved
    (net.py does ``from resnet import ...``)."""
    import sys
    spec_r = importlib.util.spec_from_file_location(
        'resnet', '/root/reference/resnet.py')
    resnet_mod = importlib.util.module_from_spec(spec_r)
    sys.modules['resnet'] = resnet_mod
    try:
        spec_r.loader.exec_module(resnet_mod)
        spec_n = importlib.util.spec_from_file_location(
            'ref_net', '/root/reference/net.py')
        net_mod = importlib.util.module_from_spec(spec_n)
        spec_n.loader.exec_module(net_mod)
    finally:
        del sys.modules['resnet']
    # the net constructors hardcode pretrained=True (a model-zoo download,
    # unavailable here and irrelevant: weights get randomized anyway)
    for name in ('resnet18', 'resnet34', 'resnet50'):
        fn = getattr(resnet_mod, name)
        setattr(net_mod, name,
                (lambda f: lambda **kw: f(**{**kw, 'pretrained': False}))(fn))
    return net_mod


def test_flax_resnet8s_matches_reference_forward():
    """Full-net (backbone + decoder) parity for the LINEMOD heatmap-mode
    Resnet18_8s (net.py:7-79): dilated output-stride-8 backbone, replaced
    fc conv head, skip-concat decoder with UpsamplingBilinear2d, final
    biased 1x1 conv."""
    import torch

    import jax
    import jax.numpy as jnp

    from esa_pose_estimation_tpu.models.resnet8s import resnet18_8s
    from esa_pose_estimation_tpu.utils.torch_import import (
        import_reference_resnet8s,
    )

    net_mod = _load_reference_net_module()
    net = net_mod.Resnet18_8s(ver_dim=32)
    torch.manual_seed(1)
    with torch.no_grad():
        for p in net.parameters():
            p.uniform_(-0.1, 0.1)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert ref.shape == (1, 32, 32, 32)

    model = resnet18_8s(ver_dim=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    variables = import_reference_resnet8s(variables, net.state_dict(),
                                          depth=18, strict=True)
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert np.abs(ref).max() > 1e-3
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_flax_resnet8s2o_matches_reference_pvnet_forward():
    """Two-output (seg + vertex) PVNet net parity against the reference's
    lib/networks/model_repository.py:7-80 Resnet18_8s — the net the
    LINEMOD RANSAC-voting path trains.  Same state_dict layout as net.py's
    single-output net with convraw.3 widened to seg_dim+ver_dim."""
    import sys
    import types

    import torch

    import jax
    import jax.numpy as jnp

    from esa_pose_estimation_tpu.models.resnet8s import ResNet8s2o
    from esa_pose_estimation_tpu.utils.torch_import import (
        import_reference_resnet8s,
    )

    # lib/networks/resnet.py is a duplicate of the top-level resnet.py
    # (SURVEY §2 #4) whose extra `lib.utils.config` import drags in the
    # EasyDict path config; register the top-level copy under the package
    # name model_repository imports.
    spec_r = importlib.util.spec_from_file_location(
        'lib.networks.resnet', '/root/reference/resnet.py')
    resnet_mod = importlib.util.module_from_spec(spec_r)
    saved = {k: sys.modules.get(k) for k in
             ('lib', 'lib.networks', 'lib.networks.resnet')}
    sys.modules['lib'] = types.ModuleType('lib')
    sys.modules['lib.networks'] = types.ModuleType('lib.networks')
    sys.modules['lib.networks.resnet'] = resnet_mod
    try:
        spec_r.loader.exec_module(resnet_mod)
        spec_n = importlib.util.spec_from_file_location(
            'ref_model_repository',
            '/root/reference/lib/networks/model_repository.py')
        repo_mod = importlib.util.module_from_spec(spec_n)
        spec_n.loader.exec_module(repo_mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    repo_mod.resnet18 = \
        lambda **kw: resnet_mod.resnet18(**{**kw, 'pretrained': False})

    net = repo_mod.Resnet18_8s(ver_dim=18, seg_dim=2)
    torch.manual_seed(2)
    with torch.no_grad():
        for p in net.parameters():
            p.uniform_(-0.1, 0.1)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        seg_ref, ver_ref = net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    seg_ref = seg_ref.numpy().transpose(0, 2, 3, 1)
    ver_ref = ver_ref.numpy().transpose(0, 2, 3, 1)

    model = ResNet8s2o(ver_dim=18, seg_dim=2, depth=18, fc_dim=256,
                       s8_dim=128, s4_dim=64, s2_dim=32, raw_dim=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    variables = import_reference_resnet8s(variables, net.state_dict(),
                                          depth=18, strict=True,
                                          scope=('ResNet8s_0',))
    seg, ver = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(seg), seg_ref,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ver), ver_ref,
                               atol=5e-4, rtol=1e-3)


def test_flax_hrnet_matches_reference_forward_no_cbam_variant():
    """The seg_hrnet.py-family variant path (no attention, 1x1 first head
    conv is NOT exercised here — seg_hrnet3 hardcodes 3x3; this variant
    still pins with_cbam=False block wiring against the same reference
    blocks by disabling the gates numerically).

    The reference has no switch to drop CBAM, so instead the torch net's
    attention weights are zeroed -> every gate is exactly sigmoid(0)=0.5,
    and the Flax net must reproduce that through its real CBAM path.
    """
    import torch

    import jax
    import jax.numpy as jnp

    from esa_pose_estimation_tpu.models.hrnet import HRNet
    from esa_pose_estimation_tpu.utils.config import HRNetConfig, StageConfig
    from esa_pose_estimation_tpu.utils.torch_import import (
        import_reference_hrnet,
    )

    extra = {
        'FINAL_CONV_KERNEL': 1,
        'STAGE1': _stage(1, 1, (1,), (16,)),
        'STAGE2': _stage(1, 2, (1, 1), (16, 32)),
        'STAGE3': _stage(1, 3, (1, 1, 1), (16, 32, 64)),
        'STAGE4': _stage(1, 4, (1, 1, 1, 1), (16, 32, 64, 128)),
    }
    cfg = HRNetConfig(
        stage1=StageConfig(1, 1, (1,), (16,)),
        stage2=StageConfig(1, 2, (1, 1), (16, 32)),
        stage3=StageConfig(1, 3, (1, 1, 1), (16, 32, 64)),
        stage4=StageConfig(1, 4, (1, 1, 1, 1), (16, 32, 64, 128)),
    )

    net = _build_reference_net(_load_reference_module(), extra)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if '.ca.' in name or '.sa.' in name or name.startswith(
                    ('ca.', 'sa.')):
                p.zero_()

    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    model = HRNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 1)), train=False)
    variables = import_reference_hrnet(variables, net.state_dict(), cfg,
                                       strict=True)
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
