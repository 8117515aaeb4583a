"""MFU flat-tail experiments (VERDICT r2 item 5, QUALITY.md §3).

Round-2 roofline: the batch-256 serving step spends 26.4 ms in the head
conv at 84% of bf16 peak and ~58 ms in ~2000 small bandwidth-bound
fusions (32/64-channel branch convs at 0.19-0.5 lane efficiency, CBAM
gates, fuse resizes).  This script measures the judge's proposed levers
on the real chip:

  (b) zero-padding sub-128-lane channels: build an HRNet whose stage
      widths are padded to the 128-lane boundary, time its FORWARD
      against the flagship at identical batch — if the padded net is not
      faster, lane-padding cannot pay at any accuracy cost, because the
      padded net does strictly more arithmetic AND more HBM traffic.
      (A positive result would motivate a zero-padded serving-time param
      transform that preserves outputs exactly.)
  (d) batch scaling: the flat tail amortizes with more pixels per
      fusion; sweep batch 128/256/512.

Lever (a) — merging per-branch ConvBN chains into grouped convs — is
structurally void for HRNet: the branches of a module run at DIFFERENT
spatial resolutions (64/32/16/8 px), and a grouped conv requires one
shared spatial grid; there is no cross-branch conv to merge without
changing the computation.  Lever (c) — epilogue-fusing CBAM pooling into
the preceding conv — was already answered by the round-2 fused-CBAM
kernel study: the device trace showed XLA fuses the gate element-wise
passes into the surrounding convs, and the remaining pool reduces are
latency-, not bandwidth-, limited.  Both are documented in QUALITY.md §3
with this script's numbers.

Run on the TPU host: python scripts/mfu_experiments.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

N_ITERS = 10
V5E_PEAK_FLOPS = 197e12


def time_forward(model, batch):
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)), train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    x = jnp.zeros((batch, 128, 128, 1), jnp.float32)
    out = fwd(variables, x)
    out.block_until_ready()
    start = time.perf_counter()
    for _ in range(N_ITERS):
        out = fwd(variables, x)
    float(out.sum())                       # hard sync
    elapsed = time.perf_counter() - start
    try:
        cost = fwd.lower(variables, x).compile().cost_analysis()
        flops = float(cost.get('flops', 0.0))
    except Exception:
        flops = 0.0
    ms = elapsed / N_ITERS * 1e3
    return {
        'ms_per_batch': round(ms, 2),
        'img_per_s': round(batch * N_ITERS / elapsed, 1),
        'gflop_per_img': round(flops / batch / 1e9, 2) if flops else None,
        'mfu': round(flops * N_ITERS / elapsed / V5E_PEAK_FLOPS, 4)
        if flops else None,
    }


def time_fn(fn, *args, iters: int = N_ITERS):
    """Steady-state ms per call with a hard host sync per measurement."""
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))  # hard sync
    return (time.perf_counter() - start) / iters * 1e3


def chain_experiment():
    """VERDICT r4 item 7: block-resident branch chain (Pallas, activations
    pinned in VMEM across k residual blocks) vs the XLA conv chain, at the
    HRNet branch-1 shape (64x64x32) for batch 256 and 512.

    MEASURED NEGATIVE (v5e, 2026-08-20; QUALITY.md §3 lever 6): median of
    3x20-iter trials — XLA 3.6 ms (b256) / 6.2 ms (b512) vs Pallas
    block_t=1 17.8 / 34.0 ms (block_t>=2 exceeds VMEM).  The XLA chain
    runs at ~23% MFU ≈ its N=cout=32 lane-efficiency roofline, i.e. the
    narrow convs are MXU-lane-bound, NOT HBM-bound; the round-trips the
    resident kernel removes are ~0.1 of XLA's ~0.45 ms/conv, while its
    tap-matmuls occupy 1/16 of each MXU tile (K=32, N=32) and pay
    per-hop pad/reshape relayouts.  Methodology note: a single-trial
    first draft read the XLA baseline at 218 ms — through this remote
    tunnel one-shot timings are unreliable; everything here is
    best-of-3 trials with a hard host-transfer sync per trial
    (block_until_ready does not sync on this backend)."""
    from esa_pose_estimation_tpu.experimental import branch_chain as bc

    k, c, h = 4, 32, 64
    weights, biases = bc.make_test_chain(jax.random.PRNGKey(0), k=k, c=c)
    flops_per_img = 2 * k * (h * h * 9 * c * c * 2)

    def best_ms(fn, *args):
        return min(time_fn(fn, *args, iters=20) for _ in range(3))

    results = {}
    for batch in (256, 512):
        x = (0.5 * jax.random.normal(
            jax.random.PRNGKey(1), (batch, h, h, c))).astype(jnp.bfloat16)
        row = {'xla_ms': round(best_ms(jax.jit(bc.branch_chain_xla), x,
                                       weights, biases), 2)}
        for t in (1, 2, 4):
            try:
                fn = jax.jit(lambda a, _t=t: bc.branch_chain_pallas(
                    a, weights, biases, block_t=_t, interpret=False))
                row[f'pallas_t{t}_ms'] = round(best_ms(fn, x), 2)
            except Exception as e:  # noqa: BLE001 — VMEM overflow is data
                row[f'pallas_t{t}_ms'] = f'failed: {type(e).__name__}'
        total = flops_per_img * batch
        for name, ms in list(row.items()):
            if isinstance(ms, float):
                row[name.replace('_ms', '_mfu')] = round(
                    total / (ms * 1e-3) / V5E_PEAK_FLOPS, 4)
        results[f'chain_b{batch}'] = row
        print(json.dumps({f'chain_b{batch}': row}), flush=True)
    return results


def int8_experiment():
    """Head-conv int8 probe: does XLA's s8xs8->s32 conv reach the 2x MXU
    rate at the flagship head shape (3x3, 480->480 at 64px, batch 256)?
    Times the exact f32->bf16 baseline, the int8 conv INCLUDING dynamic
    activation quantization + dequant, and the raw int8 conv alone.
    Decide-then-integrate: experimental/int8_head.py only wires into the
    model if this probe shows a real win."""
    from esa_pose_estimation_tpu.experimental import int8_head as q

    batch, hw, c = 256, 64, 480
    key = jax.random.PRNGKey(0)
    w = 0.05 * jax.random.normal(key, (3, 3, c, c), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (batch, hw, hw, c))
    w_q, s_w = q.quantize_weights_per_channel(w)
    x_bf, w_bf = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    x_q8, _ = q.quantize_activations(x)

    import jax.lax as lax

    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))

    def conv_bf16(a, k):
        return lax.conv_general_dilated(
            a, k, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    def conv_s8(a, k):
        return lax.conv_general_dilated(
            a, k, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    flops = 2 * batch * hw * hw * 9 * c * c

    def best_ms(fn, *args):
        return min(time_fn(fn, *args, iters=20) for _ in range(3))

    out = {}
    for name, fn, args in (
            ('bf16', jax.jit(conv_bf16), (x_bf, w_bf)),
            ('int8_with_quant', jax.jit(
                lambda a: q.int8_conv(a, w_q, s_w)), (x,)),
            ('int8_raw', jax.jit(conv_s8), (x_q8, w_q))):
        try:
            ms = best_ms(fn, *args)
            out[name] = {'ms': round(ms, 2),
                         'tflops': round(flops / (ms * 1e-3) / 1e12, 1),
                         'mfu_vs_bf16_peak': round(
                             flops / (ms * 1e-3) / V5E_PEAK_FLOPS, 3)}
        except Exception as e:  # noqa: BLE001 — unsupported dtype is data
            out[name] = f'failed: {type(e).__name__}: {e}'
        print(json.dumps({name: out[name]}), flush=True)
    return out


def int8_matmul_experiment():
    """Does XLA engage v5e's 2x int8 MXU rate for DOT_GENERAL (vs the
    conv probe's negative)?  Times (M, K) x (K, N) at the head-conv-
    equivalent contraction (K=N=480, M=batch*HW tile) in bf16 vs
    s8xs8->s32, plus a 9-shifted-matmul decomposition of the 3x3 conv
    (conv = sum of 9 shifted 1x1 convs, each an int8 matmul): if int8
    dot wins 2x, the head conv can route through matmuls instead of
    XLA's convolution."""
    key = jax.random.PRNGKey(0)
    m, k, n = 65536, 480, 480
    a = jax.random.normal(key, (m, k), jnp.float32)
    b = 0.05 * jax.random.normal(jax.random.fold_in(key, 1), (k, n),
                                 jnp.float32)
    a8 = jnp.clip(jnp.round(a * 20), -127, 127).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b * 500), -127, 127).astype(jnp.int8)

    def mm_bf16(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_s8(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    flops = 2 * m * k * n

    def best_ms(fn, *args):
        return min(time_fn(fn, *args, iters=20) for _ in range(3))

    out = {}
    for name, fn, args in (
            ('mm_bf16', jax.jit(mm_bf16),
             (a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))),
            ('mm_s8', jax.jit(mm_s8), (a8, b8))):
        ms = best_ms(fn, *args)
        out[name] = {'ms': round(ms, 3),
                     'tflops': round(flops / (ms * 1e-3) / 1e12, 1),
                     'mfu_vs_bf16_peak': round(
                         flops / (ms * 1e-3) / V5E_PEAK_FLOPS, 3)}
        print(json.dumps({name: out[name]}), flush=True)

    # 9-shifted-matmul conv decomposition at the real head shape
    batch, hw, c = 256, 64, 480
    x8 = jnp.clip(jnp.round(jax.random.normal(
        jax.random.fold_in(key, 2), (batch, hw, hw, c)) * 20),
        -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(0.05 * jax.random.normal(
        jax.random.fold_in(key, 3), (3, 3, c, c)) * 500),
        -127, 127).astype(jnp.int8)

    def conv_via_mm(x, w):
        acc = jnp.zeros((batch, hw, hw, c), jnp.int32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for dy in range(3):
            for dx in range(3):
                sh = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (batch, hw, hw, c))
                acc = acc + jax.lax.dot_general(
                    sh.reshape(-1, c), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).reshape(batch, hw, hw, c)
        return acc

    conv_flops = 2 * batch * hw * hw * 9 * c * c
    ms = best_ms(jax.jit(conv_via_mm), x8, w8)
    out['conv3x3_as_9_s8_matmuls'] = {
        'ms': round(ms, 2),
        'tflops': round(conv_flops / (ms * 1e-3) / 1e12, 1),
        'mfu_vs_bf16_peak': round(
            conv_flops / (ms * 1e-3) / V5E_PEAK_FLOPS, 3)}
    print(json.dumps({'conv3x3_as_9_s8_matmuls':
                      out['conv3x3_as_9_s8_matmuls']}), flush=True)
    return out


def main():
    import sys
    if '--chain' in sys.argv:
        print(json.dumps(chain_experiment()))
        return
    if '--int8' in sys.argv:
        print(json.dumps(int8_experiment()))
        return
    if '--int8-matmul' in sys.argv:
        print(json.dumps(int8_matmul_experiment()))
        return

    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    results = {}

    # (d) batch sweep on the flagship
    flagship = HRNet(cfg_mod.hrnet_esa(), dtype=jnp.bfloat16)
    for b in (128, 256, 512):
        results[f'flagship_b{b}'] = time_forward(flagship, b)
        print(json.dumps({f'flagship_b{b}': results[f'flagship_b{b}']}),
              flush=True)

    # (b) lane-padded variant: stage widths rounded up to 128 lanes
    base = cfg_mod.hrnet_esa()
    pad = dataclasses.replace(
        base,
        stem_channels=128,
        stage1=dataclasses.replace(base.stage1, num_channels=(128,)),
        stage2=dataclasses.replace(base.stage2, num_channels=(128, 128)),
        stage3=dataclasses.replace(base.stage3,
                                   num_channels=(128, 128, 128)),
        stage4=dataclasses.replace(base.stage4,
                                   num_channels=(128, 128, 128, 256)),
    )
    padded = HRNet(pad, dtype=jnp.bfloat16)
    results['lane_padded_b256'] = time_forward(padded, 256)
    print(json.dumps({'lane_padded_b256': results['lane_padded_b256']}),
          flush=True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
