"""Dilated ResNet-8s keypoint networks (PVNet-style), Flax/NHWC.

TPU-native re-design of the reference secondary model family
(reference: net.py:7-155 ``Resnet18_8s``/``Resnet50_8s`` over the dilated
backbone in resnet.py:116-221): a ResNet backbone with output stride 8
(layers 3/4 switch to stride-1 dilated convs), followed by a U-Net-ish
decoder that upsamples 8s -> 4s -> 2s -> full resolution with skip concats,
emitting ``ver_dim`` heatmap channels.

No torchvision pretrained-weight loading (resnet.py:223-280) — training
from scratch is the supported path; a weight-import utility can translate
torch checkpoints into these NHWC params if ever needed.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from esa_pose_estimation_tpu.models.layers import ConvBN, resize_bilinear

Dtype = Any


class ResBlock(nn.Module):
    """Standard (non-CBAM) basic residual block with optional dilation."""
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        pad = self.dilation
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=pad, kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, axis_name=self.axis_name)(out)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(self.features, (3, 3), padding=pad,
                      kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, axis_name=self.axis_name)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              bn_momentum=0.9, dtype=self.dtype,
                              axis_name=self.axis_name)(x, train)
        return nn.relu(out + residual.astype(out.dtype)).astype(self.dtype)


class ResBottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_ch = self.features * 4
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        out = ConvBN(self.features, 1, 1, bn_momentum=0.9, **kw)(x, train)
        pad = self.dilation
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=pad, kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, axis_name=self.axis_name)(out)
        out = nn.relu(out).astype(self.dtype)
        out = ConvBN(out_ch, 1, 1, relu=False, bn_momentum=0.9,
                     **kw)(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, 1, self.stride, relu=False,
                              bn_momentum=0.9, **kw)(x, train)
        return nn.relu(out + residual.astype(out.dtype)).astype(self.dtype)


_ARCH = {
    # name: (block, blocks_per_layer, bottleneck?)
    18: (ResBlock, (2, 2, 2, 2), False),
    34: (ResBlock, (3, 4, 6, 3), False),
    50: (ResBottleneck, (3, 4, 6, 3), True),
}


class ResNetBackbone8s(nn.Module):
    """Dilated ResNet, output stride 8 (reference: resnet.py:116-221).

    Returns (x2s, x4s, x8s, xfc) feature maps at strides 2, 4, 8, 8.
    """
    depth: int = 18
    fc_dim: int = 256
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layout, _ = _ARCH[self.depth]
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, axis_name=self.axis_name)(x)
        x2s = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x2s, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # (features, stride, dilation) per layer for output_stride=8.
        plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        feats = []
        for (features, stride, dilation), n_blocks in zip(plan, layout):
            for bi in range(n_blocks):
                x = block(features, stride=stride if bi == 0 else 1,
                          dilation=dilation, **kw)(x, train)
            feats.append(x)
        x4s, x8s = feats[0], feats[1]
        # reference resnet.py/net.py use torch-default BN momentum 0.1
        # (= Flax 0.9) everywhere, including shortcuts (resnet.py:189)
        xfc = ConvBN(self.fc_dim, 3, 1, bn_momentum=0.9, **kw)(feats[3], train)
        return x2s, x4s, x8s, xfc


class ConvBNLeaky(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, axis_name=self.axis_name)(x)
        return nn.leaky_relu(x, 0.1).astype(self.dtype)


class ResNet8s(nn.Module):
    """ResNet-8s keypoint net (reference: net.py Resnet18_8s/Resnet50_8s).

    Input (B, H, W, C) -> (B, H, W, ver_dim) heatmaps.
    """
    ver_dim: int = 32
    depth: int = 18
    fc_dim: int = 256
    s8_dim: int = 128
    s4_dim: int = 64
    s2_dim: int = 32
    raw_dim: int = 32
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        raw = x.astype(self.dtype)
        x2s, x4s, x8s, xfc = ResNetBackbone8s(
            self.depth, self.fc_dim, **kw)(raw, train)

        fm = ConvBNLeaky(self.s8_dim, **kw)(
            jnp.concatenate([xfc, x8s], axis=-1), train)
        fm = resize_bilinear(fm, x4s.shape[1:3], align_corners=True)
        fm = ConvBNLeaky(self.s4_dim, **kw)(
            jnp.concatenate([fm, x4s], axis=-1), train)
        fm = resize_bilinear(fm, x2s.shape[1:3], align_corners=True)
        fm = ConvBNLeaky(self.s2_dim, **kw)(
            jnp.concatenate([fm, x2s], axis=-1), train)
        fm = resize_bilinear(fm, raw.shape[1:3], align_corners=True)
        fm = ConvBNLeaky(self.raw_dim, **kw)(
            jnp.concatenate([fm, raw], axis=-1), train)
        out = nn.Conv(self.ver_dim, (1, 1), dtype=self.dtype)(fm)
        return out.astype(jnp.float32)


class ResNet8s2o(nn.Module):
    """Two-output PVNet head: segmentation + vertex field
    (reference: net.py:157-223 ``Resnet50_8s_2o`` — seg_dim mask logits and
    ver_dim direction-field channels from a shared decoder).

    Output: (seg (B, H, W, seg_dim), vertex (B, H, W, ver_dim)) where
    ver_dim = 2 * n_keypoints, reshapeable to (B, H, W, K, 2) for
    ops/voting.
    """
    ver_dim: int = 18
    seg_dim: int = 2
    depth: int = 50
    fc_dim: int = 384
    s8_dim: int = 256
    s4_dim: int = 128
    s2_dim: int = 64
    raw_dim: int = 64
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = ResNet8s(ver_dim=self.seg_dim + self.ver_dim,
                         depth=self.depth, fc_dim=self.fc_dim,
                         s8_dim=self.s8_dim, s4_dim=self.s4_dim,
                         s2_dim=self.s2_dim, raw_dim=self.raw_dim,
                         dtype=self.dtype, axis_name=self.axis_name)
        out = trunk(x, train)
        return out[..., :self.seg_dim], out[..., self.seg_dim:]


class ResNet8sDetector(nn.Module):
    """Single-channel objectness-heatmap heads over the dilated backbone
    (reference: lib/networks/model_repository.py:302-330).

    ``tap='fc'`` mirrors ``Resnet18_8s_detector`` (1-ch conv on the fc
    feature); ``tap='8s'`` mirrors ``..._v2`` (1-ch conv on the layer-2
    feature).  With ``tap='8s'`` XLA dead-code-eliminates the unused
    layer-3/4/fc tail from the jitted program, recovering the reference
    v2's truncated-trunk economy without a second module.  This family is
    reference scaffolding — the serving pipeline's trained TinyDetector
    (models/detector.py) supersedes it.

    Output: (B, H/8, W/8, 1) objectness logits.
    """
    depth: int = 18
    tap: str = 'fc'                     # 'fc' | '8s'
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, _, x8s, xfc = ResNetBackbone8s(
            self.depth, dtype=self.dtype,
            axis_name=self.axis_name)(x.astype(self.dtype), train)
        feat = xfc if self.tap == 'fc' else x8s
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(feat)
        return out.astype(jnp.float32)


def pvnet_loss(seg_logits: jnp.ndarray, vertex_pred: jnp.ndarray,
               mask: jnp.ndarray, vertex_target: jnp.ndarray,
               vertex_weight: float = 1.0) -> jnp.ndarray:
    """PVNet training loss: per-pixel seg cross-entropy + masked smooth-L1
    on the vertex field (the reference LINEMOD training objective)."""
    import jax

    from esa_pose_estimation_tpu.ops.vertex import vertex_loss

    labels = mask.astype(jnp.int32)
    ls = jax.nn.log_softmax(seg_logits, axis=-1)
    seg_ce = jnp.mean(-ls[..., 0] * (1 - labels) - ls[..., 1] * labels)
    b, h, w, _ = vertex_pred.shape
    k = vertex_target.shape[-2]
    vp = vertex_pred.reshape(b, h, w, k, 2)
    vl = vertex_loss(vp, vertex_target, mask)
    return seg_ce + vertex_weight * vl


def resnet18_8s(ver_dim: int = 32, **kw) -> ResNet8s:
    """Parity with net.py:7-79 defaults."""
    return ResNet8s(ver_dim=ver_dim, depth=18, fc_dim=256, s8_dim=128,
                    s4_dim=64, s2_dim=32, raw_dim=32, **kw)


def resnet50_8s(ver_dim: int = 32, **kw) -> ResNet8s:
    """Parity with net.py:81-155 defaults."""
    return ResNet8s(ver_dim=ver_dim, depth=50, fc_dim=384, s8_dim=256,
                    s4_dim=128, s2_dim=64, raw_dim=64, **kw)


def resnet34_8s(ver_dim: int = 32, **kw) -> ResNet8s:
    """Parity with net.py:225-299 defaults."""
    return ResNet8s(ver_dim=ver_dim, depth=34, fc_dim=256, s8_dim=128,
                    s4_dim=64, s2_dim=32, raw_dim=32, **kw)
