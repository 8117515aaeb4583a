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


# Eval-time fuse-layer conv merging (experimental/merged_fuse.py).
# Module-level so tests/benches can force either path.  Default OFF: the
# merged program is exact but measured 3.2% SLOWER than the composite on
# a real chip — a quarantined negative result (QUALITY.md §3).
MERGED_FUSE: bool = False


class FuseLayer(nn.Module):
    """Cross-resolution fusion (reference: seg_hrnet3.py:219-292).

    For output branch i and input branch j:
      j > i: 1x1 conv + BN, bilinear-upsample to branch i resolution;
      j == i: identity;
      j < i: (i-j) strided 3x3 convs (ReLU between, none on the last).
    Outputs relu(sum_j path_ij(x_j)) per branch.

    Optional merged eval path (``MERGED_FUSE``, default off; the
    quarantined experiment in experimental/merged_fuse.py): per-path BNs
    folded into conv kernels and same-source paths concatenated into
    full-lane convs — identical math, same parameter tree, measured
    slower on chip.  Training always keeps the composite (BN must see
    per-path batch statistics).
    """
    num_branches: int
    channels: tuple[int, ...]
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if MERGED_FUSE and not train and not self.is_initializing():
            from esa_pose_estimation_tpu.experimental.merged_fuse import (
                merged_fuse,
            )
            return merged_fuse(self, xs, resize_bilinear)
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
        # int8_serving marks the FLOP-dominant head conv (73% of forward
        # FLOPs) as eligible for the int8 serving path — active only when
        # layers.INT8_SERVING is switched on (default off, see layers.py)
        total = ConvBN(total.shape[-1], c.first_head_kernel, 1,
                       int8_serving=True, **kw)(total, train)
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
