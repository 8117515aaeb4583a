"""Shared model building blocks (Flax, NHWC, TPU-friendly).

Re-designs of the reference's torch modules:

* ``ConvBN`` — conv3x3/BN pairs used everywhere (seg_hrnet3.py:26-29).
  NHWC layout so XLA maps convs straight onto the MXU; params stay f32
  while activations may flow in bfloat16 (``dtype``).
* ``ChannelAttention`` / ``SpatialAttention`` — CBAM gates
  (seg_hrnet3.py:32-61).
* ``BasicBlock`` / ``Bottleneck`` — residual blocks with CBAM
  (seg_hrnet3.py:63-145).
* BatchNorm replaces InPlaceABNSync (models/sync_bn/inplace_abn/bn.py):
  under pjit/GSPMD a BN mean over a batch axis sharded across the mesh
  lowers to a global ``all-reduce`` automatically, so cross-replica
  statistics need no custom queue protocol — pass ``axis_name`` only when
  using shard_map/pmap explicitly.

PyTorch BN momentum 0.01 == Flax momentum 0.99 (complementary conventions).
The reference mixes two momenta: residual-block bodies keep the torch
DEFAULT 0.1 (= Flax 0.9), while stem/downsample/fuse/transition/head BNs
use BN_MOMENTUM=0.01 (= Flax 0.99) — reproduced per-site below.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize on NHWC feature maps.

    ``align_corners=False`` matches ``F.interpolate(mode='bilinear')``
    (jax.image half-pixel convention); ``align_corners=True`` matches
    ``nn.UpsamplingBilinear2d`` used in the reference head
    (seg_hrnet3.py:376).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if not align_corners:
        import jax
        return jax.image.resize(x, (n, oh, ow, c), method='bilinear')
    # align_corners=True: sample positions i * (h-1)/(oh-1).  Expressed as
    # dense tent-weight interpolation matmuls (one per axis) instead of
    # gathers: samples lie inside [0, in-1], so max(0, 1-|j-pos|) is the
    # exact two-tap bilinear weight, and the resample rides the MXU (same
    # trick as ops/crop.py:_interp_matrix; gathers are the slow path here).
    def axis_matrix(in_size, out_size):
        if out_size == 1 or in_size == 1:
            m = jnp.zeros((out_size, in_size), jnp.float32)
            return m.at[:, 0].set(1.0)
        from esa_pose_estimation_tpu.ops.crop import _interp_matrix
        pos = jnp.arange(out_size, dtype=jnp.float32) \
            * ((in_size - 1) / (out_size - 1))
        return _interp_matrix(pos, in_size)

    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    wy = axis_matrix(h, oh).astype(dt)
    wx = axis_matrix(w, ow).astype(dt)
    rows = jnp.einsum('oh,nhwc->nowc', wy, x)
    return jnp.einsum('pw,nowc->nopc', wx, rows)


# Serving-time int8 dispatch for FLOP-dominant ConvBNs (the flagship
# head conv: 73% of forward FLOPs at 84% of bf16 peak — only a faster
# number format can pass its roofline; v5e int8 MXU rate is 2x bf16).
# Module-level so benches/tests can force either path; only ConvBNs
# constructed with ``int8_serving=True`` participate. Default off until
# the on-chip probe (scripts/mfu_experiments.py --int8) and the held-out
# accuracy gate justify it.
INT8_SERVING: bool = False


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm [+ ReLU].

    ``int8_serving=True`` marks this ConvBN as eligible for the int8
    serving path (enabled globally by ``INT8_SERVING``): per-channel
    int8 weights x dynamically-quantized int8 activations accumulate in
    int32 on the MXU, dequantize, and run the frozen-BN affine in f32
    (experimental/int8_head.py). Training and init always use the f32/
    bf16 composite — the param tree is identical either way.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    bn_momentum: float = 0.99
    int8_serving: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.int8_serving and INT8_SERVING and not train
                and not self.is_initializing()):
            from esa_pose_estimation_tpu.experimental.int8_head import (
                int8_conv,
                quantize_weights_per_channel,
            )
            w = self.get_variable('params', 'Conv_0')['kernel']
            bn_p = self.get_variable('params', 'BatchNorm_0')
            bn_s = self.get_variable('batch_stats', 'BatchNorm_0')
            w_q, s_w = quantize_weights_per_channel(
                jnp.asarray(w, jnp.float32))
            y = int8_conv(x.astype(jnp.float32), w_q, s_w,
                          stride=self.stride)
            inv = bn_p['scale'] / jnp.sqrt(bn_s['var'] + 1e-5)
            y = (y - bn_s['mean']) * inv + bn_p['bias']
            if self.relu:
                y = nn.relu(y)
            return y.astype(self.dtype)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.axis_name)(x)
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


class ChannelAttention(nn.Module):
    """CBAM channel gate (reference: seg_hrnet3.py:32-47).

    sigmoid(MLP(avgpool(x)) + MLP(maxpool(x))) with a shared C->C/16->C
    1x1-conv MLP (no bias).
    """
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.ratio, 1)
        # two standard reduces (XLA lowers these better than a fused
        # variadic sum+max reduce — measured ~1% faster end to end)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        fc1 = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)
        # one MLP pass over both pooled vectors (stacked on the batch
        # axis) instead of two: identical math (1x1 conv is per-sample
        # linear), half the tiny-kernel dispatches on TPU
        both = jnp.concatenate([avg, mx], axis=0)
        y = fc2(nn.relu(fc1(both)))
        b = x.shape[0]
        return nn.sigmoid(y[:b] + y[b:])


class SpatialAttention(nn.Module):
    """CBAM spatial gate (reference: seg_hrnet3.py:49-61)."""
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = nn.Conv(1, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(s)
        return nn.sigmoid(s)


# Serving-time dispatch of CBAM to the fused Pallas kernel
# (experimental/cbam_fuse.py).  Module-level so tests can force either path.
#
# Default False: measured on v5e at batch 256 (2026-08-17), the kernel
# beats the standalone XLA composite only when the channel dim fills the
# 128-lane VPU and the map is large (64x64x256: 8.4 vs 9.6 ms, 1.14x;
# everywhere else the 98-tap spatial-conv loop and partial-lane channel
# ops lose — 64x64x32: 5.1 vs 0.84 ms, 128x128x64: 19.7 vs 10.7 ms), and
# even dispatching it only at the winning shape moved the end-to-end
# serving bench 3024 -> 3016 img/s (noise): inside the full program XLA
# fuses the composite's gate passes into the surrounding convs, so there
# is no traffic left to save.  The kernel stays as tested infrastructure
# (and a documented negative result) rather than a default.
FUSED_CBAM: bool | None = False


def _fused_cbam_profitable(shape) -> bool:
    _, h, w, c = shape
    return c >= 256 and h * w >= 4096


class CBAM(nn.Module):
    """Channel + spatial gate, optionally fused with the residual tail.

    ``__call__(x)`` returns the gated map (reference seg_hrnet3.py:499:
    the attended stem skip).  ``__call__(x, residual)`` additionally
    applies the block tail ``relu(gated + residual)`` (seg_hrnet3.py:95-97)
    so that on TPU at eval time the whole chain runs as one Pallas kernel
    (one read of x/residual, one write — the XLA composite costs ~6 HBM
    passes per block).  Training and non-TPU backends use the Flax
    composite below, which created the identical param tree in round 1
    (checkpoints stay compatible).
    """
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        use_fused = FUSED_CBAM
        if use_fused is None:
            import jax
            use_fused = (jax.default_backend() == 'tpu'
                         and _fused_cbam_profitable(x.shape))
        # never under a training step, even when forced: the Pallas
        # kernel has no VJP, so value_and_grad through it would crash
        # far from wherever FUSED_CBAM was toggled
        if use_fused and not train and not self.is_initializing():
            from esa_pose_estimation_tpu.experimental.cbam_fuse import (
                fused_cbam_pallas,
            )
            ca = self.get_variable('params', 'ChannelAttention_0')
            sa = self.get_variable('params', 'SpatialAttention_0')
            c = x.shape[-1]
            fc1 = ca['Conv_0']['kernel'].reshape(c, -1)
            fc2 = ca['Conv_1']['kernel'].reshape(-1, c)
            spw = sa['Conv_0']['kernel'].reshape(7, 7, 2)
            return fused_cbam_pallas(x, fc1, fc2, spw, residual)
        x_g = ChannelAttention(dtype=self.dtype)(x) * x
        x_g = SpatialAttention(dtype=self.dtype)(x_g) * x_g
        if residual is None:
            return x_g
        return nn.relu(x_g + residual).astype(self.dtype)


class BasicBlock(nn.Module):
    """Residual basic block [+ CBAM] (reference: seg_hrnet3.py:63-99)."""
    features: int
    stride: int = 1
    with_cbam: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # Reference parity: the block's own BNs run at torch-default
        # momentum 0.1 (= Flax 0.9, seg_hrnet3.py:69-72 pass no momentum);
        # only the downsample uses BN_MOMENTUM=0.01 (seg_hrnet3.py:432).
        out = ConvBN(self.features, 3, self.stride, bn_momentum=0.9,
                     dtype=self.dtype, axis_name=self.axis_name)(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, bn_momentum=0.9,
                     dtype=self.dtype, axis_name=self.axis_name)(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype,
                              axis_name=self.axis_name)(x, train)
        if self.with_cbam:
            return CBAM(dtype=self.dtype)(out, residual, train)
        return nn.relu(out + residual).astype(self.dtype)


class Bottleneck(nn.Module):
    """Residual bottleneck [+ CBAM] (reference: seg_hrnet3.py:102-145)."""
    features: int
    stride: int = 1
    with_cbam: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_ch = self.features * 4
        # torch-default momentum in the block body (seg_hrnet3.py:108-113);
        # BN_MOMENTUM=0.01 only in the downsample (seg_hrnet3.py:195-196)
        out = ConvBN(self.features, 1, 1, bn_momentum=0.9, dtype=self.dtype,
                     axis_name=self.axis_name)(x, train)
        out = ConvBN(self.features, 3, self.stride, bn_momentum=0.9,
                     dtype=self.dtype, axis_name=self.axis_name)(out, train)
        out = ConvBN(out_ch, 1, 1, relu=False, bn_momentum=0.9,
                     dtype=self.dtype, axis_name=self.axis_name)(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, 1, self.stride, relu=False,
                              dtype=self.dtype,
                              axis_name=self.axis_name)(x, train)
        if self.with_cbam:
            return CBAM(dtype=self.dtype)(out, residual, train)
        return nn.relu(out + residual).astype(self.dtype)


BLOCKS: dict[str, type[nn.Module]] = {
    'BASIC': BasicBlock,
    'BOTTLENECK': Bottleneck,
}
