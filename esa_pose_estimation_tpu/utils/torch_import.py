"""Torch-checkpoint weight import/export for the Flax model families.

The reference trains its ResNet-8s backbones from torchvision ImageNet
weights (reference: resnet.py:223-280 ``load_state_dict(model_zoo...)``)
and saves/loads its HRNet as a torch ``state_dict`` (reference:
main.py:176-204).  This module translates such checkpoints into the NHWC
Flax parameter trees used here — and back — so users can

* seed :class:`~esa_pose_estimation_tpu.models.resnet8s.ResNetBackbone8s`
  from a torchvision ``resnet18/34/50`` state_dict, and
* carry a reference-trained ``seg_hrnet3``-family checkpoint onto TPU
  (or export a TPU-trained model back to the reference's naming).

Conversions applied:

* conv kernels: torch OIHW ``(out, in, kh, kw)`` -> flax HWIO
  ``(kh, kw, in, out)``;
* BatchNorm: ``weight/bias`` -> params ``scale/bias``,
  ``running_mean/var`` -> batch_stats ``mean/var``;
* biased convs feeding BN (the reference head, seg_hrnet3.py:360-376 uses
  default ``bias=True`` Conv2d before BatchNorm): the bias is folded into
  the BN running mean (``mean' = mean - bias``), since the Flax ``ConvBN``
  blocks deliberately drop the redundant bias;
* grayscale adaptation: when the Flax conv expects 1 input channel but the
  torch kernel has 3 (ImageNet weights), the kernel is summed over the
  input-channel axis (preserves response to grayscale replicated-RGB).

No torch import is required: ``state_dict`` values may be torch tensors,
numpy arrays, or anything ``np.asarray`` accepts (tensors are detached via
``.detach().cpu().numpy()`` when present).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import numpy as np

from esa_pose_estimation_tpu.utils.config import HRNetConfig, StageConfig

Path = tuple[str, ...]


def _to_np(v: Any) -> np.ndarray:
    if hasattr(v, 'detach'):                       # torch tensor, no import
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_checkpoint(path: str,
                          allow_pickle: bool = False) -> dict[str, np.ndarray]:
    """Load a ``.pth`` file into a flat numpy state_dict.

    Accepts either a bare state_dict or the reference's
    ``{'net': state_dict, 'optim': ..., 'epoch': ...}`` wrapper
    (reference: main.py:176-182), and strips ``module.`` DataParallel
    prefixes (reference wraps nets in DataParallel, main.py:254).

    Loads with ``weights_only=True`` by default — both documented formats
    are plain tensor/dict payloads, and full unpickling executes arbitrary
    code from the file (third-party checkpoints are untrusted input).
    Pass ``allow_pickle=True`` only for a trusted legacy file that fails
    the safe loader.
    """
    import torch  # local import: only needed for file loading

    try:
        obj = torch.load(path, map_location='cpu',
                         weights_only=not allow_pickle)
    except Exception as e:
        if allow_pickle:
            raise
        raise RuntimeError(
            f'{path!r} does not load as a plain weights checkpoint; if '
            f'you trust its origin, retry with allow_pickle=True') from e
    if isinstance(obj, dict) and 'net' in obj and hasattr(obj['net'], 'items'):
        obj = obj['net']
    if hasattr(obj, 'state_dict'):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        out[k] = _to_np(v)
    return out


# ---------------------------------------------------------------------------
# Mapping plan: a list of (kind, torch_prefix, flax_path) operations.
# kind: 'conv' (weight only), 'convb' (weight+bias), 'bn',
#       'bnfold' (bn whose preceding conv had a bias: torch_prefix is
#       (bn_prefix, conv_prefix))
# ---------------------------------------------------------------------------

class _Plan:
    def __init__(self) -> None:
        self.ops: list[tuple[str, Any, Path]] = []

    def conv(self, t: str, f: Path) -> None:
        self.ops.append(('conv', t, f))

    def convb(self, t: str, f: Path) -> None:
        self.ops.append(('convb', t, f))

    def bn(self, t: str, f: Path) -> None:
        self.ops.append(('bn', t, f))

    def convbn(self, tconv: str, tbn: str, f: Path,
               conv_bias: bool = False) -> None:
        """A ConvBN flax block: conv at f/Conv_0, BN at f/BatchNorm_0."""
        self.conv(tconv, f + ('Conv_0',))
        if conv_bias:
            self.ops.append(('bnfold', (tbn, tconv), f + ('BatchNorm_0',)))
        else:
            self.bn(tbn, f + ('BatchNorm_0',))

    def cbam(self, t: str, f: Path) -> None:
        """Reference CBAM attrs ``ca``/``sa`` (seg_hrnet3.py:32-61) ->
        flax CBAM_0 subtree."""
        p = t + '.' if t else ''
        self.conv(f'{p}ca.fc.0', f + ('ChannelAttention_0', 'Conv_0'))
        self.conv(f'{p}ca.fc.2', f + ('ChannelAttention_0', 'Conv_1'))
        self.conv(f'{p}sa.conv1', f + ('SpatialAttention_0', 'Conv_0'))


def _hrnet_block(plan: _Plan, t: str, f: Path, block: str, inplanes: int,
                 planes: int, stride: int, with_cbam: bool) -> int:
    """One reference BasicBlock/Bottleneck (seg_hrnet3.py:63-145) ->
    flax models.layers.BasicBlock/Bottleneck.  Returns out channels."""
    exp = 4 if block == 'BOTTLENECK' else 1
    out_ch = planes * exp
    if block == 'BOTTLENECK':
        plan.convbn(f'{t}.conv1', f'{t}.bn1', f + ('ConvBN_0',))
        plan.convbn(f'{t}.conv2', f'{t}.bn2', f + ('ConvBN_1',))
        plan.convbn(f'{t}.conv3', f'{t}.bn3', f + ('ConvBN_2',))
        ds_name = 'ConvBN_3'
    else:
        plan.convbn(f'{t}.conv1', f'{t}.bn1', f + ('ConvBN_0',))
        plan.convbn(f'{t}.conv2', f'{t}.bn2', f + ('ConvBN_1',))
        ds_name = 'ConvBN_2'
    if with_cbam:
        plan.cbam(t, f + ('CBAM_0',))
    if stride != 1 or inplanes != out_ch:
        plan.convbn(f'{t}.downsample.0', f'{t}.downsample.1',
                    f + (ds_name,))
    return out_ch


def _hrnet_branch(plan: _Plan, t: str, f: Path, block: str, n_blocks: int,
                  inplanes: int, planes: int, with_cbam: bool) -> int:
    """A block sequence (reference _make_layer / _make_one_branch,
    seg_hrnet3.py:426-442) -> flax BranchBlocks."""
    blk_name = 'Bottleneck' if block == 'BOTTLENECK' else 'BasicBlock'
    ch = inplanes
    for i in range(n_blocks):
        ch = _hrnet_block(plan, f'{t}.{i}', f + (f'{blk_name}_{i}',),
                          block, ch, planes, 1, with_cbam)
    return ch


def _hrnet_transition(plan: _Plan, t: str, f: Path,
                      pre: list[int], cur: list[int]) -> None:
    """Reference _make_transition_layer (seg_hrnet3.py:392-424) ->
    flax Transition (ConvBN_k in creation order)."""
    k = 0
    n_pre = len(pre)
    for i, ch in enumerate(cur):
        if i < n_pre:
            if pre[i] != ch:
                plan.convbn(f'{t}.{i}.0', f'{t}.{i}.1', f + (f'ConvBN_{k}',))
                k += 1
        else:
            for j in range(i + 1 - n_pre):
                plan.convbn(f'{t}.{i}.{j}.0', f'{t}.{i}.{j}.1',
                            f + (f'ConvBN_{k}',))
                k += 1


def _hrnet_module(plan: _Plan, t: str, f: Path, stage: StageConfig,
                  cur: list[int], with_cbam: bool) -> None:
    """Reference HighResolutionModule (seg_hrnet3.py:147-292) ->
    flax HRModule (branches then FuseLayer_0)."""
    for b in range(stage.num_branches):
        _hrnet_branch(plan, f'{t}.branches.{b}', f + (f'BranchBlocks_{b}',),
                      stage.block, stage.num_blocks[b], cur[b],
                      stage.num_channels[b], with_cbam)
    if stage.num_branches == 1:
        return
    k = 0
    fuse = f + ('FuseLayer_0',)
    for i in range(stage.num_branches):
        for j in range(stage.num_branches):
            if j > i:
                plan.convbn(f'{t}.fuse_layers.{i}.{j}.0',
                            f'{t}.fuse_layers.{i}.{j}.1',
                            fuse + (f'ConvBN_{k}',))
                k += 1
            elif j < i:
                for s in range(i - j):
                    plan.convbn(f'{t}.fuse_layers.{i}.{j}.{s}.0',
                                f'{t}.fuse_layers.{i}.{j}.{s}.1',
                                fuse + (f'ConvBN_{k}',))
                    k += 1


def hrnet_plan(cfg: HRNetConfig) -> list[tuple[str, Any, Path]]:
    """Full reference-HRNet-state_dict <-> flax-HRNet mapping plan
    (reference module attribute layout: seg_hrnet3.py:300-470)."""
    plan = _Plan()
    plan.conv('conv1', ('stem_conv1',))
    plan.bn('bn1', ('stem_bn1',))
    plan.convbn('conv2', 'bn2', ('ConvBN_0',))

    s1 = cfg.stage1
    exp1 = 4 if s1.block == 'BOTTLENECK' else 1
    _hrnet_branch(plan, 'layer1', ('BranchBlocks_0',), s1.block,
                  s1.num_blocks[0], cfg.stem_channels, s1.num_channels[0],
                  cfg.with_cbam)
    pre = [s1.num_channels[0] * exp1]

    hr_idx = 0
    for si, stage in enumerate((cfg.stage2, cfg.stage3, cfg.stage4), start=2):
        exp = 4 if stage.block == 'BOTTLENECK' else 1
        cur = [c * exp for c in stage.num_channels]
        _hrnet_transition(plan, f'transition{si - 1}',
                          (f'Transition_{si - 2}',), pre, cur)
        for m in range(stage.num_modules):
            _hrnet_module(plan, f'stage{si}.{m}', (f'HRModule_{hr_idx}',),
                          stage, cur, cfg.with_cbam)
            hr_idx += 1
        pre = cur

    # Head (seg_hrnet3.py:357-386): biased convs feeding BN -> bias folded.
    plan.convbn('last_layer.0', 'last_layer.1', ('ConvBN_1',),
                conv_bias=True)
    plan.convbn('last_layer.3', 'last_layer.4', ('ConvBN_2',),
                conv_bias=True)
    if cfg.attended_stem_skip:
        plan.cbam('', ('CBAM_0',))
    plan.convb('output_layer.0', ('output_conv',))
    return plan.ops


def _prefix_ops(ops: Iterable[tuple[str, Any, Path]],
                prefix: str) -> list[tuple[str, Any, Path]]:
    """Prepend a torch attribute prefix (e.g. ``resnet18_8s.``) to every
    torch key in a plan."""
    out = []
    for kind, t, f in ops:
        t = (prefix + t[0], prefix + t[1]) if kind == 'bnfold' \
            else prefix + t
        out.append((kind, t, f))
    return out


def resnet8s_net_plan(depth: int) -> list[tuple[str, Any, Path]]:
    """Full reference ``Resnet{18,34,50}_8s`` (net.py:7-155) state_dict <->
    flax :class:`models.resnet8s.ResNet8s` mapping: the dilated backbone
    under its ``resnet{depth}_8s.`` attribute prefix, the replaced ``fc``
    conv head (net.py:22-26), the ``conv8s/conv4s/conv2s/convraw`` decoder
    (net.py:30-59), and the final biased 1x1 ``ver_dim`` conv."""
    backbone = f'resnet{depth}_8s'
    scope: Path = ('ResNetBackbone8s_0',)
    plan = _Plan()
    plan.ops += [(k, t, scope + f) for k, t, f in
                 _prefix_ops(resnet_plan(depth), backbone + '.')]
    plan.convbn(f'{backbone}.fc.0', f'{backbone}.fc.1',
                scope + ('ConvBN_0',))
    for i, name in enumerate(('conv8s', 'conv4s', 'conv2s', 'convraw')):
        plan.convbn(f'{name}.0', f'{name}.1', (f'ConvBNLeaky_{i}',))
    plan.convb('convraw.3', ('Conv_0',))
    return plan.ops


def resnet_plan(depth: int) -> list[tuple[str, Any, Path]]:
    """torchvision resnet{18,34,50} state_dict -> flax ResNetBackbone8s
    (reference pretrained-load semantics: resnet.py:223-280; the dilated
    layers reuse the stock kernels — dilation changes no weight shapes)."""
    layouts = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
    bottleneck = depth == 50
    layout = layouts[depth]
    plan = _Plan()
    plan.conv('conv1', ('Conv_0',))
    plan.bn('bn1', ('BatchNorm_0',))
    blk_name = 'ResBottleneck' if bottleneck else 'ResBlock'
    plans = [(64, 1), (128, 2), (256, 1), (512, 1)]  # (features, stride)
    inplanes = 64
    gi = 0
    for li, ((planes, stride), n_blocks) in enumerate(zip(plans, layout)):
        for bi in range(n_blocks):
            t = f'layer{li + 1}.{bi}'
            f: Path = (f'{blk_name}_{gi}',)
            st = stride if bi == 0 else 1
            out_ch = planes * (4 if bottleneck else 1)
            if bottleneck:
                plan.convbn(f'{t}.conv1', f'{t}.bn1', f + ('ConvBN_0',))
                plan.conv(f'{t}.conv2', f + ('Conv_0',))
                plan.bn(f'{t}.bn2', f + ('BatchNorm_0',))
                plan.convbn(f'{t}.conv3', f'{t}.bn3', f + ('ConvBN_1',))
                ds = 'ConvBN_2'
            else:
                plan.conv(f'{t}.conv1', f + ('Conv_0',))
                plan.bn(f'{t}.bn1', f + ('BatchNorm_0',))
                plan.conv(f'{t}.conv2', f + ('Conv_1',))
                plan.bn(f'{t}.bn2', f + ('BatchNorm_1',))
                ds = 'ConvBN_0'
            if st != 1 or inplanes != out_ch:
                plan.convbn(f'{t}.downsample.0', f'{t}.downsample.1',
                            f + (ds,))
            inplanes = out_ch
            gi += 1
    return plan.ops


# ---------------------------------------------------------------------------
# Plan application
# ---------------------------------------------------------------------------

def _get(tree: dict, path: Path) -> Any:
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: dict, path: Path, value: Any) -> None:
    for p in path[:-1]:
        tree = tree[p]
    if path[-1] not in tree:
        raise KeyError(f'no parameter at {"/".join(path)}')
    old = tree[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(f'{"/".join(path)}: shape {tuple(value.shape)} != '
                         f'expected {tuple(old.shape)}')
    tree[path[-1]] = value.astype(np.asarray(old).dtype)


def _conv_kernel(w: np.ndarray, want_in: int) -> np.ndarray:
    k = np.transpose(_to_np(w), (2, 3, 1, 0))      # OIHW -> HWIO
    if k.shape[2] != want_in:
        if want_in == 1:                           # RGB -> grayscale stem
            k = k.sum(axis=2, keepdims=True)
        else:
            raise ValueError(
                f'conv in-channels {k.shape[2]} != expected {want_in}')
    return k


def apply_plan(variables: dict, state_dict: dict[str, np.ndarray],
               ops: Iterable[tuple[str, Any, Path]],
               scope: Path = ()) -> tuple[dict, set[str]]:
    """Return a new ``variables`` with the plan applied; also the set of
    consumed torch keys.  Missing torch keys raise ``KeyError``."""
    import jax

    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables.get('batch_stats', {}))
    used: set[str] = set()

    def sd(key: str) -> np.ndarray:
        if key not in state_dict:
            raise KeyError(f'torch checkpoint missing key: {key}')
        used.add(key)
        return _to_np(state_dict[key])

    for kind, t, f in ops:
        f = scope + f
        if kind in ('conv', 'convb'):
            want_in = _get(params, f + ('kernel',)).shape[2]
            _set(params, f + ('kernel',), _conv_kernel(sd(f'{t}.weight'),
                                                       want_in))
            if kind == 'convb':
                _set(params, f + ('bias',), sd(f'{t}.bias'))
        elif kind in ('bn', 'bnfold'):
            if kind == 'bnfold':
                tbn, tconv = t
                fold = sd(f'{tconv}.bias')
            else:
                tbn, fold = t, 0.0
            _set(params, f + ('scale',), sd(f'{tbn}.weight'))
            _set(params, f + ('bias',), sd(f'{tbn}.bias'))
            _set(stats, f + ('mean',), sd(f'{tbn}.running_mean') - fold)
            _set(stats, f + ('var',), sd(f'{tbn}.running_var'))
        else:  # pragma: no cover
            raise ValueError(kind)

    out = dict(variables)
    out['params'] = jax.tree.map(np.asarray, params)
    if 'batch_stats' in variables:
        out['batch_stats'] = jax.tree.map(np.asarray, stats)
    return out, used


def export_plan(variables: dict, ops: Iterable[tuple[str, Any, Path]],
                scope: Path = ()) -> dict[str, np.ndarray]:
    """Inverse of :func:`apply_plan`: emit a torch-naming state_dict from
    the flax variables (folded conv biases are exported as zeros)."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    sd: dict[str, np.ndarray] = {}
    for kind, t, f in ops:
        f = scope + f
        if kind in ('conv', 'convb'):
            k = np.asarray(_get(params, f + ('kernel',)))
            sd[f'{t}.weight'] = np.transpose(k, (3, 2, 0, 1))  # HWIO->OIHW
            if kind == 'convb':
                sd[f'{t}.bias'] = np.asarray(_get(params, f + ('bias',)))
        else:
            if kind == 'bnfold':
                tbn, tconv = t
                sd[f'{tconv}.bias'] = np.zeros(
                    np.asarray(_get(params, f + ('bias',))).shape, np.float32)
            else:
                tbn = t
            sd[f'{tbn}.weight'] = np.asarray(_get(params, f + ('scale',)))
            sd[f'{tbn}.bias'] = np.asarray(_get(params, f + ('bias',)))
            sd[f'{tbn}.running_mean'] = np.asarray(_get(stats, f + ('mean',)))
            sd[f'{tbn}.running_var'] = np.asarray(_get(stats, f + ('var',)))
    return sd


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def import_reference_hrnet(variables: dict, state_dict: dict,
                           cfg: HRNetConfig,
                           strict: bool = True) -> dict:
    """Load a reference ``seg_hrnet3``-family torch state_dict into flax
    HRNet variables.  ``strict`` additionally requires every torch key to
    be consumed (ignoring torch bookkeeping like ``num_batches_tracked``)."""
    out, used = apply_plan(variables, state_dict, hrnet_plan(cfg))
    if strict:
        left = {k for k in state_dict
                if k not in used and not k.endswith('num_batches_tracked')}
        if left:
            raise ValueError(f'unconsumed torch keys: {sorted(left)[:8]}'
                             f'{" ..." if len(left) > 8 else ""}')
    return out


def import_reference_resnet8s(variables: dict, state_dict: dict,
                              depth: int = 18,
                              strict: bool = True,
                              scope: Path = ()) -> dict:
    """Load a full reference ``Resnet{18,34,50}_8s`` torch state_dict
    (net.py:7-155, the LINEMOD heatmap-mode net) into flax ``ResNet8s``
    variables — backbone AND decoder, so a reference-trained PVNet
    checkpoint can be carried onto TPU whole.

    The PVNet seg+vertex two-output net
    (lib/networks/model_repository.py:7-80) has the identical layout with
    ``convraw.3`` emitting ``seg_dim+ver_dim`` channels; import it into
    :class:`~.models.resnet8s.ResNet8s2o` with ``scope=('ResNet8s_0',)``
    (the 2o wrapper's shared trunk)."""
    out, used = apply_plan(variables, state_dict, resnet8s_net_plan(depth),
                           scope=scope)
    if strict:
        left = {k for k in state_dict
                if k not in used and not k.endswith('num_batches_tracked')}
        if left:
            raise ValueError(f'unconsumed torch keys: {sorted(left)[:8]}'
                             f'{" ..." if len(left) > 8 else ""}')
    return out


def import_torchvision_resnet(variables: dict, state_dict: dict,
                              depth: int,
                              scope: Path = ('ResNetBackbone8s_0',)) -> dict:
    """Seed the dilated ResNet-8s backbone from torchvision ImageNet
    weights (reference: resnet.py:223-280).  ``fc.*`` / unmatched decoder
    params are left untouched, mirroring the reference's partial load."""
    out, _ = apply_plan(variables, state_dict, resnet_plan(depth),
                        scope=scope)
    return out


def export_reference_hrnet(variables: dict, cfg: HRNetConfig) -> dict:
    """Export flax HRNet variables to the reference's torch state_dict
    naming (round-trip complement of :func:`import_reference_hrnet`)."""
    return export_plan(variables, hrnet_plan(cfg))
