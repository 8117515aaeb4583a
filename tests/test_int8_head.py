"""Int8 head-conv quantization (experimental/int8_head.py): the
quantized conv must agree with exact f32 to int8 resolution, and the
weight quantizer must be exact on already-quantized grids."""

import jax
import jax.numpy as jnp
import numpy as np

from esa_pose_estimation_tpu.experimental import int8_head as q


def test_weight_quantizer_exact_on_grid():
    """Weights already on a 127-step symmetric grid round-trip exactly."""
    key = jax.random.PRNGKey(0)
    levels = jax.random.randint(key, (3, 3, 8, 16), -127, 128)
    # the quantizer derives each channel's scale from its max-abs, so the
    # grid only round-trips if every channel actually contains a +/-127
    levels = levels.at[0, 0, 0, :].set(127)
    scale = 0.013
    w = levels.astype(jnp.float32) * scale
    w_q, s_w = q.quantize_weights_per_channel(w)
    back = w_q.astype(jnp.float32) * s_w
    np.testing.assert_allclose(np.asarray(back), np.asarray(w),
                               rtol=1e-6, atol=1e-7)


def test_int8_conv_tracks_f32():
    key = jax.random.PRNGKey(1)
    w = 0.05 * jax.random.normal(key, (3, 3, 32, 48), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 32))
    w_q, s_w = q.quantize_weights_per_channel(w)
    out = q.int8_conv(x, w_q, s_w)
    ref = q.conv_f32(x, w)
    # int8 on both operands: relative error ~1/127 per operand; the K=288
    # reduction averages rounding noise, so a few percent end to end
    denom = np.maximum(np.abs(np.asarray(ref)), 1e-2)
    rel = np.abs(np.asarray(out) - np.asarray(ref)) / denom
    assert float(np.median(rel)) < 0.03
    assert float(np.mean(rel)) < 0.10


def test_error_stats_reasonable():
    w = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (3, 3, 16, 16))
    stats = q.head_error_stats(jax.random.PRNGKey(3), w, batch=2, hw=16)
    assert stats['rel_err_mean'] < 0.2
    assert stats['abs_err_p99'] < stats['ref_abs_p99']
