"""VGG conv feature extractors (legacy PoseCNN-era baselines).

Parity with the reference's VGG family (reference:
lib/networks/vgg.py:86-197 factories, lib/networks/vgg16_convs.py:21-60
``VGG16Convs`` used as a two-scale feature extractor).  Kept small and
NHWC; BatchNorm variants available like the reference's ``vgg*_bn``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Standard VGG configurations (layer widths; 'M' = max-pool).
CFGS: dict[str, tuple] = {
    'vgg11': (64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    'vgg13': (64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M',
              512, 512, 'M'),
    'vgg16': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512, 'M'),
    'vgg19': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M'),
}


class VGGFeatures(nn.Module):
    """VGG conv trunk.  Returns one feature map per stage: the PRE-pool
    activation of each conv block (conv*_N, e.g. stages[3] is the
    stride-8 conv4_3 map for vgg16), plus the final post-pool map."""
    cfg: str = 'vgg16'
    batch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        stages = []
        for item in CFGS[self.cfg]:
            if item == 'M':
                stages.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype)(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=jnp.float32)(x)
                x = nn.relu(x).astype(self.dtype)
        stages.append(x)
        return stages


class VGG16Convs(nn.Module):
    """Two-scale feature extractor (vgg16_convs.py:21-60 parity): returns
    (conv4_3 features at stride 8, conv5_3 features at stride 16)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages = VGGFeatures('vgg16', dtype=self.dtype)(x, train)
        # stages: pre-pool activations per block; conv4_3 is block 4's,
        # conv5_3 is block 5's final conv output.
        return stages[3], stages[4]
