"""HRNet multi-resolution keypoint network (Flax, NHWC).

TPU-native re-design of the reference ESA keypoint model family
(models/seg_hrnet3.py:301-548 — the flagship grayscale 30-keypoint net with
CBAM; models/seg_hrnet.py / seg_hrnet2.py variants via HRNetConfig flags).
Topology is driven by :class:`~esa_pose_estimation_tpu.utils.config.HRNetConfig`
(mirroring config/default.py:45-75).

Structure (for a 128x128 crop):

  stem: conv3x3 s1 (in->64)  [raw output saved for the head skip]
        conv3x3 s2 (64->64)                     -> 64x64 resolution
  stage1: residual blocks at one resolution
  stage2..4: parallel branches at 1/1..1/8 of stem resolution with
        full cross-resolution fusion after each module
  head: upsample all branches to branch-0 size, concat, 3x3+1x1 convs to
        K channels, bilinear x2 up (align_corners=True, parity with
        nn.UpsamplingBilinear2d), concat CBAM-attended stem, 3x3 -> K.

Differences from a torch port, by design:
* NHWC layout end-to-end (XLA/MXU native);
* activations can flow in bfloat16 (``dtype``) with f32 params and f32 BN;
* convs feeding BatchNorm drop their redundant bias terms;
* fusion upsampling is resolved at trace time from static shapes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from esa_pose_estimation_tpu.models.layers import (
    BLOCKS,
    CBAM,
    ConvBN,
    resize_bilinear,
)
from esa_pose_estimation_tpu.utils.config import HRNetConfig, StageConfig

Dtype = Any


class BranchBlocks(nn.Module):
    """A sequence of residual blocks forming one branch of a stage."""
    block: str
    num_blocks: int
    features: int
    with_cbam: bool
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = BLOCKS[self.block]
        for _ in range(self.num_blocks):
            x = blk(self.features, with_cbam=self.with_cbam,
                    dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


# Eval-time fuse-layer conv merging (see FuseLayer docstring).  Module
# level so tests/benches can force either path.  Default OFF: the merged
# program is exact but measured 3.2% SLOWER than the composite on a real
# chip (115.5 vs 111.9 ms per batch-256 hrnet_esa forward) — XLA already
# fuses the composite's per-path ConvBNs, and the merged path's kernel
# concat + output slicing adds HBM traffic the saved dispatches don't
# repay.  Kept in-tree with parity tests as a documented negative result
# (QUALITY.md §3), same standard as the rejected Pallas kernels.
MERGED_FUSE: bool = False


def _fuse_path_specs(num_branches: int) -> dict[tuple[int, int], list[int]]:
    """Replay FuseLayer's composite construction order.

    Returns (target i, source j) -> list of ``ConvBN_<k>`` child indices
    along that path (1 entry for j>i up-paths, i-j entries for the
    downsample chain).  Flax auto-names children by call order, so the
    merged path can address the exact parameters the composite created —
    checkpoints trained on either path stay interchangeable.
    """
    specs: dict[tuple[int, int], list[int]] = {}
    idx = 0
    for i in range(num_branches):
        for j in range(num_branches):
            if j == i:
                continue
            n = 1 if j > i else i - j
            specs[(i, j)] = list(range(idx, idx + n))
            idx += n
    return specs


class FuseLayer(nn.Module):
    """Cross-resolution fusion (reference: seg_hrnet3.py:219-292).

    For output branch i and input branch j:
      j > i: 1x1 conv + BN, bilinear-upsample to branch i resolution;
      j == i: identity;
      j < i: (i-j) strided 3x3 convs (ReLU between, none on the last).
    Outputs relu(sum_j path_ij(x_j)) per branch.

    Optional merged eval path (``MERGED_FUSE``, default off): the
    composite issues up to n*(n-1) narrow convs (32-224 output channels —
    0.19-0.5 MXU lane efficiency) plus a BN affine each.  The merged path
    runs every path that reads the SAME source branch as ONE wide conv:
    the per-path BN is folded into the conv kernel (exact at eval, where
    BN is a per-channel affine of frozen statistics) and the folded
    kernels are concatenated along the output-channel axis — all 1x1
    up-projections of branch j become a single 1x1 conv, and the first
    3x3/s2 conv of every downsample chain from branch j becomes a single
    3x3/s2 conv (e.g. stage 4's three 32->{64,32,32} chain heads fuse
    into one 32->128, a full MXU lane).  Identical math, same parameter
    tree — but MEASURED SLOWER on chip (see MERGED_FUSE note), so it is
    opt-in.  Training always keeps the composite (BN must see per-path
    batch statistics).
    """
    num_branches: int
    channels: tuple[int, ...]
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if MERGED_FUSE and not train and not self.is_initializing():
            return self._merged(xs)
        outs = []
        for i in range(self.num_branches):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    path = xs[j]
                elif j > i:
                    path = ConvBN(self.channels[i], 1, 1, relu=False,
                                  dtype=self.dtype,
                                  axis_name=self.axis_name)(xs[j], train)
                    path = resize_bilinear(path, xs[i].shape[1:3],
                                           align_corners=False)
                else:  # j < i: downsample chain
                    path = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        path = ConvBN(ch, 3, 2, relu=not last,
                                      dtype=self.dtype,
                                      axis_name=self.axis_name)(path, train)
                y = path if y is None else y + path
            outs.append(nn.relu(y).astype(self.dtype))
        return outs

    # -- merged eval path -------------------------------------------------

    def _folded(self, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """ConvBN_<k>'s kernel with its eval-time BN affine folded in."""
        p = self.get_variable('params', f'ConvBN_{k}')
        s = self.get_variable('batch_stats', f'ConvBN_{k}')
        kernel = p['Conv_0']['kernel']
        bn, st = p['BatchNorm_0'], s['BatchNorm_0']
        eff = bn['scale'] / jnp.sqrt(st['var'] + 1e-5)
        return kernel * eff, bn['bias'] - st['mean'] * eff

    def _conv(self, x, kernel, bias, stride: int):
        import jax.lax as lax
        pad = (kernel.shape[0] // 2,) * 2
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (stride, stride), [pad, pad],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.dtype)

    def _merged(self, xs):
        n = self.num_branches
        specs = _fuse_path_specs(n)
        # contributions[i][j] = path_ij(xs[j]) at branch-i resolution
        contributions: list[dict[int, jnp.ndarray]] = [{} for _ in range(n)]
        for j in range(n):
            ups = [i for i in range(n) if i < j]
            if ups:  # all 1x1 up-projections of xs[j] as one conv
                ks, bs = zip(*(self._folded(specs[(i, j)][0]) for i in ups))
                y = self._conv(xs[j], jnp.concatenate(ks, -1),
                               jnp.concatenate(bs), 1)
                off = 0
                for i in ups:
                    sl = y[..., off:off + self.channels[i]]
                    off += self.channels[i]
                    contributions[i][j] = resize_bilinear(
                        sl, xs[i].shape[1:3], align_corners=False)
            downs = [i for i in range(n) if i > j]
            if downs:  # every chain's first 3x3/s2 conv as one conv
                head_ch = [self.channels[i] if i == j + 1 else self.channels[j]
                           for i in downs]
                ks, bs = zip(*(self._folded(specs[(i, j)][0]) for i in downs))
                y = self._conv(xs[j], jnp.concatenate(ks, -1),
                               jnp.concatenate(bs), 2)
                off = 0
                for i, ch in zip(downs, head_ch):
                    path = y[..., off:off + ch]
                    off += ch
                    if i - j > 1:      # ReLU between chain convs, then the
                        path = nn.relu(path)   # rest of the chain one by one
                        for lvl, idx in enumerate(specs[(i, j)][1:], start=1):
                            path = self._conv(path, *self._folded(idx), 2)
                            if lvl < i - j - 1:
                                path = nn.relu(path)
                    contributions[i][j] = path
        outs = []
        for i in range(n):  # composite's j-order summation, xs[i] at j == i
            y = None
            for j in range(n):
                path = xs[i] if j == i else contributions[i][j]
                y = path if y is None else y + path
            outs.append(nn.relu(y).astype(self.dtype))
        return outs


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch blocks then fusion
    (reference: seg_hrnet3.py:147-292)."""
    cfg: StageConfig
    with_cbam: bool
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        blk = BLOCKS[self.cfg.block]
        channels = tuple(c * blk.expansion for c in self.cfg.num_channels)
        xs = [
            BranchBlocks(self.cfg.block, self.cfg.num_blocks[i],
                         self.cfg.num_channels[i], self.with_cbam,
                         dtype=self.dtype, axis_name=self.axis_name)(x, train)
            for i, x in enumerate(xs)
        ]
        if self.cfg.num_branches == 1:
            return xs
        return FuseLayer(self.cfg.num_branches, channels, dtype=self.dtype,
                         axis_name=self.axis_name)(xs, train)


class Transition(nn.Module):
    """Stage transition (reference: seg_hrnet3.py:390-424): adapt channel
    counts of existing branches, spawn new lower-resolution branches from
    the last one."""
    out_channels: tuple[int, ...]
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        n_pre = len(xs)
        for i, ch in enumerate(self.out_channels):
            if i < n_pre:
                if xs[i].shape[-1] != ch:
                    outs.append(ConvBN(ch, 3, 1, dtype=self.dtype,
                                       axis_name=self.axis_name)(xs[i], train))
                else:
                    outs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    out_ch = ch if j == i - n_pre else xs[-1].shape[-1]
                    y = ConvBN(out_ch, 3, 2, dtype=self.dtype,
                               axis_name=self.axis_name)(y, train)
                outs.append(y)
        return outs


class HRNet(nn.Module):
    """The full network.  Input (B, H, W, in_channels) -> heatmaps
    (B, H, W, num_keypoints)."""
    cfg: HRNetConfig
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        raw_in = x.astype(self.dtype)

        # Stem (seg_hrnet3.py:308-314 + forward :473-478). The raw conv1
        # output (pre-BN) feeds the head skip, matching forward :516-518.
        stem = nn.Conv(c.stem_channels, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, name='stem_conv1')(raw_in)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=jnp.float32, axis_name=self.axis_name,
                         name='stem_bn1')(stem)
        x = nn.relu(x).astype(self.dtype)
        x = ConvBN(c.stem_channels, 3, 2, **kw)(x, train)

        # Stage 1 (layer1): blocks at single resolution.
        s1 = c.stage1
        x = BranchBlocks(s1.block, s1.num_blocks[0], s1.num_channels[0],
                         c.with_cbam, **kw)(x, train)
        xs = [x]

        # Stages 2-4: transition + modules.
        for stage in (c.stage2, c.stage3, c.stage4):
            blk = BLOCKS[stage.block]
            out_channels = tuple(ch * blk.expansion for ch in stage.num_channels)
            xs = Transition(out_channels, **kw)(xs, train)
            for _ in range(stage.num_modules):
                xs = HRModule(stage, c.with_cbam, **kw)(xs, train)

        # Head (seg_hrnet3.py:357-386 + forward :507-518).
        h0, w0 = xs[0].shape[1:3]
        ups = [xs[0]] + [resize_bilinear(b, (h0, w0), align_corners=False)
                         for b in xs[1:]]
        total = jnp.concatenate(ups, axis=-1)
        total = ConvBN(total.shape[-1], c.first_head_kernel, 1, **kw)(total, train)
        total = ConvBN(c.num_keypoints, c.final_conv_kernel, 1, **kw)(total, train)
        # back to the INPUT resolution (2*h0 only equals it for even
        # sizes; an odd crop would otherwise emit one extra row/col and
        # break the (B, H, W, K) contract against the loss targets)
        total = resize_bilinear(total, raw_in.shape[1:3],
                                align_corners=True)

        if c.attended_stem_skip:
            skip = CBAM(dtype=self.dtype)(stem, train=train)
        else:
            skip = raw_in
        skip = resize_bilinear(skip, total.shape[1:3], align_corners=True)
        out = jnp.concatenate([total, skip], axis=-1)
        out = nn.Conv(c.num_keypoints, (3, 3), padding=1, dtype=self.dtype,
                      name='output_conv')(out)
        return out.astype(jnp.float32)
