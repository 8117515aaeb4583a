"""Fused CBAM gate (+ residual add + ReLU) as a Pallas TPU kernel.

The reference applies CBAM (channel gate, then spatial gate;
seg_hrnet3.py:32-61) inside every residual block (:74-97).  As separate
XLA ops the gate chain costs ~5-6 full HBM passes over the block's
feature map per block (channel avg/max pools, gated-map spatial pools,
final re-scale, residual add) — across the ~100 gated blocks of
HRNet-W32+CBAM that is a large share of the serving step's bandwidth.

This kernel runs the whole chain for one image in VMEM:

  read x once ->
    channel avg/max pools -> shared C->C/16->C MLP -> sigmoid     (CA)
    per-pixel channel mean/max of the gated map -> 7x7 conv ->
    sigmoid                                                       (SA)
    out = x * ca * sa [+ residual, ReLU]
  -> write out once

i.e. 2 reads + 1 write of map-sized HBM traffic instead of ~6-8 passes.
Math is f32 inside the kernel regardless of the (usually bf16) input.

Inference-only: the training path keeps the autodiff-friendly Flax
composite (models/layers.py CBAM slow path).  Like the Pallas peak
decode, the kernel is dispatched on the single-chip TPU backend; sharded
multi-chip serving should wrap it in shard_map or use the XLA composite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, fc1_ref, fc2_ref, spw_ref, *rest, h: int, w: int,
            c: int, with_res: bool, out_dtype):
    if with_res:
        res_ref, out_ref, pa_ref, pm_ref = rest
    else:
        out_ref, pa_ref, pm_ref = rest

    xf = x_ref[0].astype(jnp.float32)                        # (h, w, c)

    # --- channel gate: sigmoid(MLP(avgpool) + MLP(maxpool)) ---
    avg = jnp.sum(jnp.sum(xf, axis=0, keepdims=True), axis=1,
                  keepdims=True) / (h * w)                   # (1, 1, c)
    mxp = jnp.max(jnp.max(xf, axis=0, keepdims=True), axis=1,
                  keepdims=True)                             # (1, 1, c)

    def mlp(v):
        # (1, c) vector through fc1 (c, hidden) / fc2 (hidden, c),
        # written as broadcast-multiply + sublane reductions (the
        # matrices are far too thin for the MXU).
        v2 = v.reshape(1, c)
        h1 = jnp.sum(jnp.swapaxes(v2, 0, 1) * fc1_ref[...], axis=0,
                     keepdims=True)                          # (1, hidden)
        h1 = jnp.maximum(h1, 0.0)
        return jnp.sum(jnp.swapaxes(h1, 0, 1) * fc2_ref[...], axis=0,
                       keepdims=True)                        # (1, c)

    cg = jax.nn.sigmoid(mlp(avg) + mlp(mxp)).reshape(1, 1, c)

    # --- spatial gate over the channel-gated map ---
    xg = xf * cg                                             # (h, w, c)
    sa = (jnp.sum(xg, axis=2, keepdims=True) / c).reshape(h, w)
    sm = jnp.max(xg, axis=2, keepdims=True).reshape(h, w)
    # zero-padded pooled maps in VMEM scratch (Mosaic has no
    # dynamic_update_slice; ref stores with static slices do the job)
    pa_ref[...] = jnp.zeros((h + 6, w + 6), jnp.float32)
    pm_ref[...] = jnp.zeros((h + 6, w + 6), jnp.float32)
    pa_ref[3:3 + h, 3:3 + w] = sa
    pm_ref[3:3 + h, 3:3 + w] = sm
    acc = jnp.zeros((h, w), jnp.float32)
    for ky in range(7):
        for kx in range(7):
            acc = acc + spw_ref[ky * 7 + kx, 0] * pa_ref[ky:ky + h,
                                                         kx:kx + w]
            acc = acc + spw_ref[ky * 7 + kx, 1] * pm_ref[ky:ky + h,
                                                         kx:kx + w]
    sg = jax.nn.sigmoid(acc)[:, :, None]                     # (h, w, 1)

    out = xg * sg
    if with_res:
        out = jnp.maximum(out + res_ref[0].astype(jnp.float32), 0.0)
    out_ref[0] = out.astype(out_dtype)


@partial(jax.jit, static_argnames=('interpret',))
def fused_cbam_pallas(x: jnp.ndarray, fc1: jnp.ndarray, fc2: jnp.ndarray,
                      spw: jnp.ndarray, residual: jnp.ndarray | None = None,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Fused CBAM on NHWC feature maps.

    x:        (B, H, W, C) feature map (bf16 or f32)
    fc1/fc2:  channel-MLP weights (C, C//16) / (C//16, C) — the reference
              shared-MLP 1x1 convs (seg_hrnet3.py:36-40) squeezed
    spw:      (7, 7, 2) spatial conv kernel (avg channel first, matching
              concatenate([avg, max]) in seg_hrnet3.py:56-59)
    residual: optional (B, H, W, C); when given the kernel also applies
              the block tail relu(gated + residual) (seg_hrnet3.py:95-97)

    Returns the gated (and, with residual, relu-ed) map in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    hidden = fc1.shape[-1]
    spw2 = spw.reshape(49, 2).astype(jnp.float32)
    with_res = residual is not None

    in_specs = [
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hidden), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((49, 2), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [x, fc1.astype(jnp.float32), fc2.astype(jnp.float32), spw2]
    if with_res:
        in_specs.append(pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    return pl.pallas_call(
        partial(_kernel, h=h, w=w, c=c, with_res=with_res,
                out_dtype=x.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 6, w + 6), jnp.float32),
                        pltpu.VMEM((h + 6, w + 6), jnp.float32)],
        # Working set is a few f32 copies of one image's map: at the
        # largest gated maps (64x64x256, 128x128x64 -> 4 MB f32) the
        # Mosaic stack runs well past the default 16 MB scoped limit.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(*args)
