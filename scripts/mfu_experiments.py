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
import time

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


def main():
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
