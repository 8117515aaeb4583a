"""End-to-end throughput benchmark (run on real TPU by the driver).

Measures the full serving pipeline on the flagship model at the reference
operating point (128x128 grayscale crops, 30 keypoints):

  crop(1920x1200 frame) -> normalize -> HRNet-W32+CBAM forward (bf16) ->
  fused peak decode + log-Taylor subpixel -> confidence-weighted
  RANSAC-EPnP + LM pose solve

and prints ONE JSON line {metric, value, unit, vs_baseline}.

Baseline: the reference eval loop runs 0.205 s/image on an RTX 3080
(BASELINE.md; main.log:6433) == 4.878 img/s; vs_baseline is the speedup
over that number.

Uses the persistent compilation cache (.jax_cache) so repeat runs skip the
XLA compile; parameters are initialized under jit (eager init dispatches
thousands of tiny ops through the device tunnel and takes minutes).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

BASELINE_IMG_PER_S = 1.0 / 0.205
BATCH = 256
N_ITERS = 10


def build_pipeline():
    from esa_pose_estimation_tpu.core import camera
    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.ops import crop as crop_ops
    from esa_pose_estimation_tpu.ops import peak as peak_ops
    from esa_pose_estimation_tpu.ops import pnp as pnp_mod
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    model = HRNet(cfg_mod.hrnet_esa(), dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)), train=False)
    K = jnp.asarray(camera.SPEED_K, jnp.float32)

    def pipeline(variables, frames, bboxes, points_3d, key):
        crops, rates, origins = crop_ops.crop_resize(frames, bboxes, 128)
        x = crop_ops.normalize(crops)[..., None]
        hm = model.apply(variables, x, train=False)          # (B,128,128,30)
        hm = jnp.transpose(hm, (0, 3, 1, 2))                 # (B,30,128,128)
        coords, maxvals = peak_ops.decode_heatmaps_auto(hm)
        sel = peak_ops.select_confident(maxvals, 0.6, min_count=24)
        uncropped = coords / rates[:, None, None] + \
            origins[:, None, :].astype(jnp.float32)
        p3 = jnp.broadcast_to(points_3d, (frames.shape[0],) + points_3d.shape)
        init = pnp_mod.ransac_epnp(p3, uncropped, K, key, valid=sel,
                                   n_hypotheses=32, lm_iters=8)
        w = jnp.where(sel, maxvals, 0.0)
        R, t = pnp_mod.lm_refine(p3, uncropped, w, K, init.R, init.t, iters=10)
        return R, t

    return variables, jax.jit(pipeline)


def main():
    from esa_pose_estimation_tpu.data import synthetic

    pts = synthetic.spacecraft_points()

    # Pre-generate input frames on device (input generation is not the
    # system under test; frames stay in HBM like a deployed ingest queue).
    keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
    samples = jax.jit(
        jax.vmap(lambda k: synthetic.make_sample(k, pts))
    )(keys)
    frames = samples.image.block_until_ready()
    bboxes = samples.bbox

    variables, pipeline = build_pipeline()

    # Pre-materialize per-iteration PRNG keys: generating keys inside the
    # timing loop adds a host->device dispatch round-trip per step (measured
    # ~0.5 s/step through the remote-TPU tunnel) that has nothing to do
    # with pipeline throughput.
    key_list = list(jax.random.split(jax.random.PRNGKey(0), N_ITERS))
    # warmup/compile
    R, t = pipeline(variables, frames, bboxes, pts, key_list[0])
    R.block_until_ready()

    start = time.perf_counter()
    for i in range(N_ITERS):
        R, t = pipeline(variables, frames, bboxes, pts, key_list[i])
    R.block_until_ready()
    elapsed = time.perf_counter() - start

    img_per_s = BATCH * N_ITERS / elapsed
    print(json.dumps({
        'metric': 'end-to-end images/sec/chip (crop+HRNet+decode+PnP)',
        'value': round(img_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
