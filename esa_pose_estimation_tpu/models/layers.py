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
        pos = jnp.arange(out_size, dtype=jnp.float32) \
            * ((in_size - 1) / (out_size - 1))
        idx = jnp.arange(in_size, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(idx[None, :] - pos[:, None]))

    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    wy = axis_matrix(h, oh).astype(dt)
    wx = axis_matrix(w, ow).astype(dt)
    rows = jnp.einsum('oh,nhwc->nowc', wy, x)
    return jnp.einsum('pw,nowc->nopc', wx, rows)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm [+ ReLU]."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
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


class CBAM(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(dtype=self.dtype)(x) * x
        x = SpatialAttention(dtype=self.dtype)(x) * x
        return x


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
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                     axis_name=self.axis_name)(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype,
                     axis_name=self.axis_name)(out, train)
        if self.with_cbam:
            out = CBAM(dtype=self.dtype)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype,
                              axis_name=self.axis_name)(x, train)
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
        out = ConvBN(self.features, 1, 1, dtype=self.dtype,
                     axis_name=self.axis_name)(x, train)
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                     axis_name=self.axis_name)(out, train)
        out = ConvBN(out_ch, 1, 1, relu=False, dtype=self.dtype,
                     axis_name=self.axis_name)(out, train)
        if self.with_cbam:
            out = CBAM(dtype=self.dtype)(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, 1, self.stride, relu=False,
                              dtype=self.dtype,
                              axis_name=self.axis_name)(x, train)
        return nn.relu(out + residual).astype(self.dtype)


BLOCKS: dict[str, type[nn.Module]] = {
    'BASIC': BasicBlock,
    'BOTTLENECK': Bottleneck,
}
