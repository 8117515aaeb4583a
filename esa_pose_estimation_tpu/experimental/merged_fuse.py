"""Eval-time HRNet fuse-layer conv merging (measured-negative experiment).

The composite FuseLayer (models/hrnet.py) issues up to n*(n-1) narrow
convs (32-224 output channels — 0.19-0.5 MXU lane efficiency) plus a BN
affine each.  The merged path here runs every path that reads the SAME
source branch as ONE wide conv: each per-path BN is folded into its conv
kernel (exact at eval, where BN is a per-channel affine of frozen
statistics) and the folded kernels are concatenated along the output
channel axis — all 1x1 up-projections of branch j become a single 1x1
conv, and the first 3x3/s2 conv of every downsample chain from branch j
becomes a single 3x3/s2 conv (e.g. stage 4's three 32->{64,32,32} chain
heads fuse into one 32->128, a full MXU lane).

Identical math, same parameter tree (full-net maxdiff 3e-7 vs the
composite) — but MEASURED SLOWER on a v5e chip: 115.5 vs 111.9 ms per
batch-256 ``hrnet_esa`` forward.  XLA already fuses each composite
path's conv+BN+add chain; the merged program's kernel concatenation and
output slicing add HBM traffic the saved dispatches don't repay.  Kept
opt-in behind ``models.hrnet.MERGED_FUSE`` with parity tests
(tests/test_models.py) per the documented-negative-result standard
(QUALITY.md §3).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn


def fuse_path_specs(num_branches: int) -> dict[tuple[int, int], list[int]]:
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


def _folded(mod, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ConvBN_<k>'s kernel with its eval-time BN affine folded in."""
    p = mod.get_variable('params', f'ConvBN_{k}')
    s = mod.get_variable('batch_stats', f'ConvBN_{k}')
    kernel = p['Conv_0']['kernel']
    bn, st = p['BatchNorm_0'], s['BatchNorm_0']
    eff = bn['scale'] / jnp.sqrt(st['var'] + 1e-5)
    return kernel * eff, bn['bias'] - st['mean'] * eff


def _conv(mod, x, kernel, bias, stride: int):
    pad = (kernel.shape[0] // 2,) * 2
    y = lax.conv_general_dilated(
        x.astype(mod.dtype), kernel.astype(mod.dtype),
        (stride, stride), [pad, pad],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias.astype(mod.dtype)


def merged_fuse(mod, xs, resize_bilinear):
    """Run ``mod`` (a FuseLayer instance) via the merged eval program."""
    n = mod.num_branches
    specs = fuse_path_specs(n)
    # contributions[i][j] = path_ij(xs[j]) at branch-i resolution
    contributions: list[dict[int, jnp.ndarray]] = [{} for _ in range(n)]
    for j in range(n):
        ups = [i for i in range(n) if i < j]
        if ups:  # all 1x1 up-projections of xs[j] as one conv
            ks, bs = zip(*(_folded(mod, specs[(i, j)][0]) for i in ups))
            y = _conv(mod, xs[j], jnp.concatenate(ks, -1),
                      jnp.concatenate(bs), 1)
            off = 0
            for i in ups:
                sl = y[..., off:off + mod.channels[i]]
                off += mod.channels[i]
                contributions[i][j] = resize_bilinear(
                    sl, xs[i].shape[1:3], align_corners=False)
        downs = [i for i in range(n) if i > j]
        if downs:  # every chain's first 3x3/s2 conv as one conv
            head_ch = [mod.channels[i] if i == j + 1 else mod.channels[j]
                       for i in downs]
            ks, bs = zip(*(_folded(mod, specs[(i, j)][0]) for i in downs))
            y = _conv(mod, xs[j], jnp.concatenate(ks, -1),
                      jnp.concatenate(bs), 2)
            off = 0
            for i, ch in zip(downs, head_ch):
                path = y[..., off:off + ch]
                off += ch
                if i - j > 1:      # ReLU between chain convs, then the
                    path = nn.relu(path)   # rest of the chain one by one
                    for lvl, idx in enumerate(specs[(i, j)][1:], start=1):
                        path = _conv(mod, path, *_folded(mod, idx), 2)
                        if lvl < i - j - 1:
                            path = nn.relu(path)
                contributions[i][j] = path
    outs = []
    for i in range(n):  # composite's j-order summation, xs[i] at j == i
        y = None
        for j in range(n):
            path = xs[i] if j == i else contributions[i][j]
            y = path if y is None else y + path
        outs.append(nn.relu(y).astype(mod.dtype))
    return outs
