"""Int8 serving quantization for the FLOP-dominant head conv.

The roofline (QUALITY.md §3) puts 73% of the flagship forward's FLOPs in
one reference-faithful conv — the 3x3 480->480 head at 64px
(seg_hrnet3.py:357-371 last_layer[0]) — already running at 84% of the
chip's bf16 peak.  The only way past that op's roofline is a faster
number format: v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate
(394 vs 197 TOPS), so quantizing JUST this conv bounds a ~1.57x
end-to-end serving speedup at batch 256 (26.4 ms head of a 85 ms step
-> ~13 ms) if the int8 conv actually reaches its peak and the accuracy
cost is acceptable.

Scheme (serving-time only, weights prepared offline from any trained
checkpoint — no quantization-aware training):

* weights: symmetric per-output-channel int8
  (``w_q[..., o] = round(w[..., o] / s_w[o])``, s_w from max-abs);
* activations: symmetric per-tensor int8 with a DYNAMIC scale computed
  from the batch's max-abs (one reduce over the feature map — cheap
  next to the conv itself, and robust to activation drift where a
  calibrated static scale silently clips);
* accumulation in int32 via ``preferred_element_type``, dequantized by
  ``s_x * s_w[o]`` and passed through the folded BN affine in f32.

``int8_conv`` is the quantized op; ``conv_f32`` the exact reference.
``head_error_stats`` reports the quantization error on random
calibration batches so the accuracy gate (held-out SPEED score delta)
can be judged before any integration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_weights_per_channel(w: jnp.ndarray
                                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO weights -> (int8 weights, f32 per-output-channel scale)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))            # (O,)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activations(x: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC activations -> (int8, f32 per-SAMPLE scale (N,1,1,1)).

    Per-sample (not per-batch) dynamic scale: one outlier frame must not
    coarsen every other frame's quantization, and a frame's served
    output must not depend on which batch it rode in — a batch-global
    scale makes the accuracy gate batch-size/ordering dependent and
    serving non-reproducible across batchings.
    """
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


@partial(jax.jit, static_argnames=('stride',))
def int8_conv(x: jnp.ndarray, w_q: jnp.ndarray, s_w: jnp.ndarray,
              stride: int = 1) -> jnp.ndarray:
    """Quantized SAME conv: f32 NHWC in, f32 NHWC out (dequantized)."""
    x_q, s_x = quantize_activations(x)
    dn = jax.lax.conv_dimension_numbers(x.shape, w_q.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), 'SAME', dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_x * s_w)


def conv_f32(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1
             ) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'SAME', dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def head_error_stats(key: jax.Array, w: jnp.ndarray, batch: int = 4,
                     hw: int = 64) -> dict:
    """Relative error of the int8 path vs exact f32 on a random batch."""
    cin = w.shape[2]
    x = jax.random.normal(key, (batch, hw, hw, cin), jnp.float32)
    w_q, s_w = quantize_weights_per_channel(w)
    ref = conv_f32(x, w)
    out = int8_conv(x, w_q, s_w)
    err = jnp.abs(out - ref)
    denom = jnp.maximum(jnp.abs(ref), 1e-6)
    return {
        'rel_err_mean': float(jnp.mean(err / denom)),
        'abs_err_p99': float(jnp.quantile(err, 0.99)),
        'ref_abs_p99': float(jnp.quantile(jnp.abs(ref), 0.99)),
    }
