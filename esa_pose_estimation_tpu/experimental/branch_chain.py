"""Block-resident branch chain: k residual blocks in one Pallas kernel.

The round-3 roofline (QUALITY.md §3) attributes the serving MFU plateau
to a flat tail of small bandwidth-bound fusions — chiefly the 32-channel
HRNet branch convs (3x3, 32->32 at 64px), each of which round-trips its
activations through HBM and runs at ~0.19-0.25 MXU lane efficiency
(N=cout=32 fills a quarter of the 128-lane tile).  This kernel tests the
one structural lever not yet measured (VERDICT r4 item 7): execute an
ENTIRE branch — k residual blocks, 2k convs — with the activations
pinned in VMEM, so HBM sees exactly one read and one write of the
feature map regardless of chain depth.

Eval-time semantics (BatchNorm folded into the conv weights/bias, the
same transform experimental/merged_fuse.py proves exact):

    for i in range(k):
        h = relu(conv3x3(x, w[i,0]) + b[i,0])
        x = relu(conv3x3(h, w[i,1]) + b[i,1] + x)     # BasicBlock residual

Kernel layout: grid over batch tiles of T images; the (T, H, W, C)
block is zero-padded once per conv hop inside VMEM and each conv is
computed as 9 shifted-tap matmuls (T*H*W, C) @ (C, C) accumulated in
f32 — taps replace im2col so no (HW, 9C) scratch is materialised (at
T=4 that scratch alone would exceed VMEM).  The matmuls inherit the
same N=32 lane waste XLA pays; what the kernel removes is the 2k-1
intermediate HBM round-trips and the per-conv dispatch overhead.

MEASURED NEGATIVE (scripts/mfu_experiments.py --chain, v5e 2026-08-20,
QUALITY.md §3 lever 6): XLA 3.6/6.2 ms vs this kernel 17.8/34.0 ms at
batch 256/512 (block_t >= 2 exceeds VMEM).  The hypothesis the kernel
tested is false at this shape: the XLA chain already runs at ~23% MFU,
which IS its N=32 lane-efficiency roofline — the convs are
MXU-lane-bound, not HBM-bound, so the eliminated round-trips (~0.1 of
~0.45 ms/conv) cannot pay for tap-matmuls that occupy 1/16 of each MXU
tile (K=32 x N=32 of a 128x128 array) plus per-hop pad/reshape
relayouts.  An in-VMEM im2col variant (K=288, eff 0.75) would at best
reach XLA parity by the same arithmetic, so the chain stays a
documented negative, kept with its exactness tests.

Reference context: the branch chains come from the reference HRNet's
per-branch BasicBlock stacks (seg_hrnet3.py stage modules); this kernel
is a TPU-serving-time execution strategy for them, not a new model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def branch_chain_xla(x: jnp.ndarray, weights: jnp.ndarray,
                     biases: jnp.ndarray) -> jnp.ndarray:
    """Baseline: the same k-block residual chain as plain XLA convs.

    x: (B, H, W, C); weights: (k, 2, 3, 3, C, C) HWIO; biases: (k, 2, C).
    """
    k = weights.shape[0]
    w = weights.astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, weights.shape[2:],
                                        ('NHWC', 'HWIO', 'NHWC'))
    for i in range(k):
        h = jax.lax.conv_general_dilated(
            x, w[i, 0], (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        h = jnp.maximum(h + biases[i, 0], 0.0).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            h, w[i, 1], (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        x = jnp.maximum(y + biases[i, 1] + x.astype(jnp.float32),
                        0.0).astype(x.dtype)
    return x


def _conv3x3_taps(xpad: jnp.ndarray, w: jnp.ndarray, t: int, h: int,
                  wd: int, c: int) -> jnp.ndarray:
    """(T, H+2, W+2, C) x (3, 3, C, C) -> (T, H, W, C) f32 via 9 shifted
    matmuls accumulated on the MXU."""
    acc = jnp.zeros((t * h * wd, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xpad[:, dy:dy + h, dx:dx + wd, :].reshape(t * h * wd, c)
            acc = acc + jax.lax.dot_general(
                tap, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(t, h, wd, c)


def _kernel(x_ref, w_ref, b_ref, out_ref, *, k: int, t: int, h: int,
            wd: int, c: int):
    x = x_ref[...]                                   # (T, H, W, C) bf16
    w = w_ref[...]                                   # (k, 2, 3, 3, C, C)
    b = b_ref[...]                                   # (k, 2, C)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    for i in range(k):
        hmid = _conv3x3_taps(jnp.pad(x, pad), w[i, 0], t, h, wd, c)
        hmid = jnp.maximum(hmid + b[i, 0], 0.0).astype(x.dtype)
        y = _conv3x3_taps(jnp.pad(hmid, pad), w[i, 1], t, h, wd, c)
        x = jnp.maximum(y + b[i, 1] + x.astype(jnp.float32),
                        0.0).astype(x.dtype)
    out_ref[...] = x


@partial(jax.jit, static_argnames=('block_t', 'interpret'))
def branch_chain_pallas(x: jnp.ndarray, weights: jnp.ndarray,
                        biases: jnp.ndarray, block_t: int = 2,
                        interpret: bool | None = None) -> jnp.ndarray:
    """VMEM-resident k-block residual chain.

    x: (B, H, W, C) bf16 (B divisible by ``block_t``);
    weights: (k, 2, 3, 3, C, C); biases: (k, 2, C).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    bsz, h, wd, c = x.shape
    k = weights.shape[0]
    assert bsz % block_t == 0, (bsz, block_t)
    wf = weights.astype(x.dtype)
    bf = biases.astype(jnp.float32)
    return pl.pallas_call(
        partial(_kernel, k=k, t=block_t, h=h, wd=wd, c=c),
        grid=(bsz // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wf.shape, lambda i: (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bf.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, h, wd, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, wf, bf)


def make_test_chain(key: jax.Array, k: int = 4, c: int = 32,
                    scale: float = 0.2):
    """Random folded-BN chain weights sized so activations stay O(1)."""
    kw, kb = jax.random.split(key)
    weights = scale * jax.random.normal(kw, (k, 2, 3, 3, c, c),
                                        jnp.float32) / jnp.sqrt(9.0 * c)
    biases = 0.1 * jax.random.normal(kb, (k, 2, c), jnp.float32)
    return weights, biases
