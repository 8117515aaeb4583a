"""End-to-end throughput benchmark (run on real TPU by the driver).

Default mode measures the full serving pipeline on the flagship model at
the reference operating point (128x128 grayscale crops, 30 keypoints):

  crop(1920x1200 frame) -> normalize -> HRNet-W32+CBAM forward (bf16) ->
  fused peak decode + log-Taylor subpixel -> confidence-weighted
  RANSAC-EPnP + LM pose solve

and prints ONE JSON line {metric, value, unit, vs_baseline, ...} where the
extras are mfu (compiled-FLOPs model FLOP utilisation vs the v5e peak) and
flops_per_image.  Inputs are a fixed frame batch staged in HBM (an ingest
queue stand-in); only the PRNG key varies per iteration — this measures
steady-state device throughput, not host ingest.  For ingest, run:

  python bench.py --mode system    # C++ shard loader -> H2D -> pipeline
  python bench.py --mode two-stage # + on-device detector supplying boxes

Baseline: the reference eval loop runs 0.205 s/image on an RTX 3080
(BASELINE.md; main.log:6433) == 4.878 img/s; vs_baseline is the speedup
over that number.

Uses the persistent compilation cache (.jax_cache) so repeat runs skip the
XLA compile; parameters are initialized under jit (eager init dispatches
thousands of tiny ops through the device tunnel and takes minutes).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('EPT_COMPILE_CACHE',
                                 os.path.join(os.path.dirname(
                                     os.path.abspath(__file__)),
                                     '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

BASELINE_IMG_PER_S = 1.0 / 0.205
BATCH = 256          # overridable with --batch
N_ITERS = 10
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip.
V5E_PEAK_FLOPS = 197e12


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

    def tail(variables, crops, rates, origins, points_3d, key):
        x = crop_ops.normalize(crops)[..., None]
        hm = model.apply(variables, x, train=False)          # (B,128,128,30)
        coords, maxvals = peak_ops.decode_heatmaps_auto_nhwc(hm)
        sel = peak_ops.select_confident(maxvals, 0.6, min_count=24)
        uncropped = coords / rates[:, None, None] + \
            origins[:, None, :].astype(jnp.float32)
        p3 = jnp.broadcast_to(points_3d, (crops.shape[0],) + points_3d.shape)
        init = pnp_mod.ransac_epnp(p3, uncropped, K, key, valid=sel,
                                   n_hypotheses=32, lm_iters=8)
        w = jnp.where(sel, maxvals, 0.0)
        R, t = pnp_mod.lm_refine(p3, uncropped, w, K, init.R, init.t, iters=10)
        return R, t

    def pipeline(variables, frames, bboxes, points_3d, key):
        crops, rates, origins = crop_ops.crop_resize(frames, bboxes, 128)
        return tail(variables, crops, rates, origins, points_3d, key)

    return variables, jax.jit(pipeline), jax.jit(tail)


def _compiled_flops(jitted, *args) -> float | None:
    """Per-invocation FLOPs from the compiler's own cost model."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if cost and cost.get('flops'):
            return float(cost['flops'])
    except Exception:
        pass
    return None


def _staged_inputs(batch: int):
    from esa_pose_estimation_tpu.data import synthetic

    pts = synthetic.spacecraft_points()
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    samples = jax.jit(
        jax.vmap(lambda k: synthetic.make_sample(k, pts))
    )(keys)
    return pts, samples.image.block_until_ready(), samples.bbox


def bench_compute() -> dict:
    pts, frames, bboxes = _staged_inputs(BATCH)
    variables, pipeline, _ = build_pipeline()

    # Pre-materialize per-iteration PRNG keys: generating keys inside the
    # timing loop adds a host->device dispatch round-trip per step (measured
    # ~0.5 s/step through the remote-TPU tunnel) that has nothing to do
    # with pipeline throughput.
    key_list = list(jax.random.split(jax.random.PRNGKey(0), N_ITERS))
    # warmup/compile
    R, t = pipeline(variables, frames, bboxes, pts, key_list[0])
    R.block_until_ready()
    flops = _compiled_flops(pipeline, variables, frames, bboxes, pts,
                            key_list[0])

    start = time.perf_counter()
    for i in range(N_ITERS):
        R, t = pipeline(variables, frames, bboxes, pts, key_list[i])
    R.block_until_ready()
    elapsed = time.perf_counter() - start

    img_per_s = BATCH * N_ITERS / elapsed
    out = {
        'metric': 'end-to-end images/sec/chip (crop+HRNet+decode+PnP)',
        'value': round(img_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }
    if flops:
        achieved = flops * N_ITERS / elapsed
        out['flops_per_image'] = round(flops / BATCH / 1e9, 3)  # GFLOP
        out['mfu'] = round(achieved / V5E_PEAK_FLOPS, 4)
    return out


def bench_system(shard_path: str | None, n_records: int = 1024,
                 threads: int = 8, host_crop: bool = False,
                 png_shard: bool = False) -> dict:
    """Full-system throughput: C++ shard decode -> H2D -> device pipeline.

    Unlike the compute mode, every image is read from disk through the
    native loader and transferred to the device inside the timed region —
    this is the number a deployment actually sees, and it honestly exposes
    an input-bound system (VERDICT round-1 weak #3).

    ``host_crop`` moves the crop+resize stage onto the loader's C++ worker
    threads (the reference's own architecture, data_load4.py:110-166) so
    the H2D leg ships 65 KB crops instead of 2.3 MB frames — the right
    configuration whenever the host->device link, not the chip, limits
    throughput (notably this 1-CPU dev host with a tunneled TPU).
    """
    from esa_pose_estimation_tpu.data import shards
    from esa_pose_estimation_tpu.data.native_loader import NativeBatchLoader

    if shard_path is None:
        shard_path = ('/tmp/ept_bench_shard_png.spd1' if png_shard
                      else '/tmp/ept_bench_shard.spd1')
    if not os.path.exists(shard_path):
        print(f'# writing synthetic shard ({n_records} frames) to '
              f'{shard_path} ...', flush=True)
        shards.write_synthetic_shard(shard_path, n_records,
                                     compressed=png_shard)

    pts, _, _ = _staged_inputs(2)
    variables, pipeline, tail = build_pipeline()
    loader = NativeBatchLoader(shard_path, BATCH, n_threads=threads,
                               shuffle=False,
                               crop_size=128 if host_crop else None)
    n_batches = len(loader)
    key_list = list(jax.random.split(jax.random.PRNGKey(0), n_batches + 1))

    def step(b, key):
        if host_crop:
            R, t = tail(variables, jnp.asarray(b['crop']),
                        jnp.asarray(b['rate']), jnp.asarray(b['origin']),
                        pts, key)
        else:
            R, t = pipeline(variables, jnp.asarray(b['frame']),
                            jnp.asarray(b['bbox']), pts, key)
        return R

    # Epoch 0 (untimed): compiles the pipeline AND pulls the shard through
    # the page cache.  Steady-state training re-reads the same shard every
    # epoch, so the warm-cache number is the production regime; the cold
    # first pass just measures this host's virtio disk (~125 MB/s).
    cold_start = time.perf_counter()
    for b in loader:
        R = step(b, key_list[-1])
    R.block_until_ready()
    cold_s = time.perf_counter() - cold_start

    count = 0
    start = time.perf_counter()
    for i, b in enumerate(loader):
        R = step(b, key_list[i])                  # H2D inside timed region
        count += BATCH
        # no block inside the loop: the C++ producer prefetches the next
        # batch while the device runs this one
    R.block_until_ready()
    elapsed = time.perf_counter() - start
    loader.close()

    img_per_s = count / elapsed
    print(f'# cold first epoch (disk-bound): '
          f'{n_batches * BATCH / cold_s:.1f} img/s', flush=True)
    stage = 'decode+crop' if host_crop else 'decode'
    if png_shard:
        stage = 'png-' + stage
    return {
        'metric': f'system images/sec/chip (C++ shard {stage}+H2D+pipeline)',
        'value': round(img_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }


def bench_two_stage(detector_ckpt: str | None,
                    downscale: int | None = None) -> dict:
    """Two-stage program: on-device detector supplies the boxes
    (reference BASELINE config 3), frames staged in HBM."""
    from esa_pose_estimation_tpu.models.detector import (
        TinyDetector,
        load_detector_config,
    )
    from esa_pose_estimation_tpu.pipeline import detect_frames

    pts, frames, _ = _staged_inputs(BATCH)
    variables, pipeline, _ = build_pipeline()

    # Geometry comes from the detector.json sidecar written at training
    # time (the weights only work at their trained input scale); an
    # explicit --detector-downscale overrides, 4 is the legacy fallback.
    ckpt_dir = detector_ckpt or 'runs/detector/net_detector'
    dcfg = load_detector_config(os.path.dirname(ckpt_dir)) or {}
    downscale = downscale or dcfg.get('downscale', 4)
    in_hw = (1200 // downscale, 1920 // downscale)
    # f32 detector: measured faster than bf16 at these shapes (the conv
    # channels are narrow; bf16 adds convert traffic without MXU benefit)
    det = TinyDetector(width=dcfg.get('width_ch', 32),
                       stride=dcfg.get('stride', 16))
    det_vars = jax.jit(det.init, static_argnames=('train',))(
        jax.random.PRNGKey(1), jnp.zeros((1,) + in_hw + (1,)), train=False)
    if detector_ckpt is None and os.path.exists('runs/detector/net_detector'):
        detector_ckpt = 'runs/detector/net_detector'
    if detector_ckpt:
        from esa_pose_estimation_tpu.cli.train_detector import (
            create_detector_state)
        from esa_pose_estimation_tpu.train.checkpoint import CheckpointManager
        # total_steps>0 matches the driver's schedule-based opt state tree
        st = create_detector_state(det, jax.random.PRNGKey(1), 1e-3,
                                   in_hw, total_steps=1000)
        name = ('best_iou' if os.path.exists(
            os.path.join(detector_ckpt, 'best_iou')) else 'last')
        st, _ = CheckpointManager(detector_ckpt).restore(name, st)
        det_vars = {'params': st.params, 'batch_stats': st.batch_stats}

    @jax.jit
    def two_stage(det_vars, variables, frames, points_3d, key):
        bboxes, _ = detect_frames(det, det_vars, frames,
                                  detector_stride=det.stride,
                                  detector_downscale=downscale,
                                  box_expand=1.1)
        return pipeline(variables, frames, bboxes, points_3d, key)

    key_list = list(jax.random.split(jax.random.PRNGKey(0), N_ITERS))
    R, t = two_stage(det_vars, variables, frames, pts, key_list[0])
    R.block_until_ready()

    start = time.perf_counter()
    for i in range(N_ITERS):
        R, t = two_stage(det_vars, variables, frames, pts, key_list[i])
    R.block_until_ready()
    elapsed = time.perf_counter() - start

    img_per_s = BATCH * N_ITERS / elapsed
    return {
        'metric': 'two-stage images/sec/chip (detect+crop+HRNet+decode+PnP)',
        'value': round(img_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }


def bench_train() -> dict:
    """Sharded training-step throughput on the flagship config (VERDICT r2
    item 2: the reference is a training codebase, main.py:237-424 — the
    main workload needs its own measured number).

    One jitted SPMD step (forward + weighted-HeatmapWing loss + backward +
    Adam + BN stat sync) on hrnet_esa at the reference operating point
    (128x128 crops, 30 keypoints, bf16 activations), batch staged in HBM,
    over a mesh of all local devices.  Reports img/s, training MFU from
    the compiler's own cost model (fwd+bwd+opt FLOPs), and a step-time
    breakdown (forward-only vs full step).
    """
    from esa_pose_estimation_tpu.data import synthetic
    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.parallel import (make_mesh, replicate,
                                                  shard_batch)
    from esa_pose_estimation_tpu.train import state as state_mod
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1, devices=devices)
    cfg = cfg_mod.TrainConfig(batch_size=BATCH, crop_size=128)
    model = HRNet(cfg_mod.hrnet_esa(), dtype=jnp.bfloat16)
    st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      (1, 128, 128, 1))
    pts = synthetic.spacecraft_points()
    batch = synthetic.make_batch(jax.random.PRNGKey(1), BATCH, pts,
                                 crop_size=128)
    batch = {k: batch[k] for k in ('image', 'heatmaps', 'weights')}

    step = state_mod.make_sharded_train_step(mesh)
    eval_step = state_mod.make_sharded_eval_step(mesh)
    st = replicate(st, mesh)
    sbatch = shard_batch(batch, mesh)
    sbatch = jax.tree.map(lambda x: x.block_until_ready(), sbatch)

    st, metrics = step(st, sbatch)              # warmup/compile
    float(metrics['loss'])                      # hard sync
    out_hm, _ = eval_step(st, sbatch)           # forward-only reference
    out_hm.block_until_ready()

    start = time.perf_counter()
    for _ in range(N_ITERS):
        st, metrics = step(st, sbatch)
    # hard host transfer, not just block_until_ready: measured on the
    # axon plugin that lower().compile() on a DONATING jit breaks
    # block_until_ready synchronization for later calls (it returned in
    # ~15 ms/step for a 228 ms step -> 580% "MFU"), so (a) the fetch
    # forces real completion and (b) cost_analysis runs AFTER the loops.
    float(metrics['loss'])
    elapsed = time.perf_counter() - start

    fstart = time.perf_counter()
    for _ in range(N_ITERS):
        out_hm, loss = eval_step(st, sbatch)
    float(loss)
    fwd_elapsed = time.perf_counter() - fstart

    flops = _compiled_flops(step, st, sbatch)   # AFTER timing (see above)

    img_per_s = BATCH * N_ITERS / elapsed
    out = {
        'metric': 'training images/sec/chip (fwd+bwd+Adam, batch '
                  f'{BATCH})',
        'value': round(img_per_s / len(devices), 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
        'step_ms': round(elapsed / N_ITERS * 1e3, 2),
        'fwd_ms': round(fwd_elapsed / N_ITERS * 1e3, 2),
        'n_devices': len(devices),
    }
    if flops:
        achieved = flops * N_ITERS / elapsed
        out['flops_per_image'] = round(flops / BATCH / 1e9, 3)   # GFLOP
        out['mfu'] = round(achieved / (V5E_PEAK_FLOPS * len(devices)), 4)
    return out


def bench_train_system(shard_path: str | None, n_records: int = 1024,
                       threads: int = 8, host_crop: bool = True,
                       png_shard: bool = False) -> dict:
    """Production-configuration training throughput: C++ shard loader ->
    double-buffered H2D -> on-device target build -> sharded train step
    (VERDICT r3 item 2: the real-data route of cli/train.py had no
    measured number; the step-level 1130 img/s assumed batches already in
    HBM).

    Default is the ``--host-crop`` ingest mode (box->crop->resize on the
    loader's C++ threads, 65 KB/img over the link — the production
    configuration for link-bound hosts and the same stage split as the
    reference's CPU DataLoader, data_load4.py:110-166).  ``--host-crop``
    off ships full 2.3 MB frames and crops on device.  Reports img/s and
    the %% of the staged-batch step rate the fed system sustains.
    """
    from esa_pose_estimation_tpu.data import pipeline as data_pipeline
    from esa_pose_estimation_tpu.data import shards, synthetic
    from esa_pose_estimation_tpu.data.native_loader import NativeBatchLoader
    from esa_pose_estimation_tpu.models import HRNet
    from esa_pose_estimation_tpu.parallel import (batch_sharding, make_mesh,
                                                  replicate)
    from esa_pose_estimation_tpu.train import state as state_mod
    from esa_pose_estimation_tpu.utils import config as cfg_mod

    if shard_path is None:
        shard_path = ('/tmp/ept_bench_shard_png.spd1' if png_shard
                      else '/tmp/ept_bench_shard.spd1')
    if not os.path.exists(shard_path):
        print(f'# writing synthetic shard ({n_records} frames) to '
              f'{shard_path} ...', flush=True)
        shards.write_synthetic_shard(shard_path, n_records,
                                     compressed=png_shard)

    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_model=1, devices=devices)
    cfg = cfg_mod.TrainConfig(batch_size=BATCH, crop_size=128)
    model = HRNet(cfg_mod.hrnet_esa(), dtype=jnp.bfloat16)
    st = state_mod.create_train_state(model, cfg, jax.random.PRNGKey(0),
                                      (1, 128, 128, 1))
    step = state_mod.make_sharded_train_step(mesh)
    st = replicate(st, mesh)
    sh = batch_sharding(mesh)

    loader = NativeBatchLoader(shard_path, BATCH, n_threads=threads,
                               shuffle=False,
                               crop_size=128 if host_crop else None)
    n_batches = len(loader)
    keys = list(jax.random.split(jax.random.PRNGKey(0), 2 * n_batches + 2))

    def build(b, key):
        if host_crop:
            tb = data_pipeline.build_batch_from_crops(
                b['crop'], b['rate'], b['origin'], b['keypoints_2d'], key)
        else:
            tb = data_pipeline.build_batch(b['frame'], b['bbox'],
                                           b['keypoints_2d'], key,
                                           crop_size=128)
        return {k: tb[k] for k in ('image', 'heatmaps', 'weights')}

    # Warm epoch: compiles build+step and pulls the shard through the
    # page cache (steady-state training re-reads the same shard every
    # epoch, so warm is the production regime).
    for i, b in enumerate(data_pipeline.prefetch_to_device(
            iter(loader), sh, size=2)):
        st, metrics = step(st, build(b, keys[-1]))
    float(metrics['loss'])

    # Staged-batch step rate (the 'chip ceiling' this system feeds):
    batch = build({k: jnp.asarray(v) for k, v in b.items()
                   if k != 'name'}, keys[-2])
    batch = jax.device_put(batch, sh)
    for _ in range(2):
        st, metrics = step(st, batch)
    float(metrics['loss'])
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        st, metrics = step(st, batch)
    float(metrics['loss'])
    staged_img_s = BATCH * N_ITERS / (time.perf_counter() - t0)

    # Timed fed epochs: loader -> prefetched H2D -> target build -> step.
    count = 0
    t0 = time.perf_counter()
    for ep in range(2):
        for i, b in enumerate(data_pipeline.prefetch_to_device(
                iter(loader), sh, size=2)):
            st, metrics = step(st, build(b, keys[ep * n_batches + i]))
            count += BATCH
    float(metrics['loss'])                          # hard sync
    elapsed = time.perf_counter() - t0
    loader.close()

    img_per_s = count / elapsed
    stage = 'decode+crop' if host_crop else 'decode'
    if png_shard:
        stage = 'png-' + stage
    return {
        'metric': f'train-system images/sec/chip (C++ {stage} + H2D + '
                  f'target build + train step, batch {BATCH})',
        'value': round(img_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
        'staged_step_img_s': round(staged_img_s, 2),
        'pct_of_staged_step': round(100 * img_per_s / staged_img_s, 1),
        'n_devices': len(devices),
    }


def bench_voting() -> dict:
    """RANSAC voting at the reference PVNet operating point (128x128 crop,
    K=32 keypoints, 128 hypotheses — src/ransac_voting_kernel.cu workload;
    VERDICT r1 weak #2 asked for a measured number at this scale)."""
    import numpy as np

    from esa_pose_estimation_tpu.ops import voting as voting_ops

    b, h, w, kp = 16, 128, 128, 32
    rng = np.random.default_rng(0)
    kps = rng.uniform(20, 108, (kp, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    grid = np.stack([xs, ys], -1)
    d = kps[None, None] - grid[:, :, None]
    d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    vertex = jnp.asarray(np.broadcast_to(d, (b, h, w, kp, 2)))
    mask = jnp.ones((b, h, w), jnp.float32)
    key_list = list(jax.random.split(jax.random.PRNGKey(0), N_ITERS))

    run = jax.jit(lambda k: voting_ops.ransac_voting(
        mask, vertex, k, n_hypotheses=128))
    run(key_list[0]).keypoints.block_until_ready()
    start = time.perf_counter()
    for i in range(N_ITERS):
        out = run(key_list[i])
    out.keypoints.block_until_ready()
    elapsed = time.perf_counter() - start
    ms_per_img = elapsed / (N_ITERS * b) * 1e3
    return {
        'metric': 'ransac voting ms/image (128x128 crop, K=32, Hyp=128)',
        'value': round(ms_per_img, 3),
        'unit': 'ms',
        'vs_baseline': round((0.205 * 1e3) / ms_per_img, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--mode', choices=['compute', 'system', 'two-stage',
                                       'voting', 'train', 'train-system'],
                    default='compute')
    ap.add_argument('--shard', default=None,
                    help='SPD1 shard for --mode system (auto-written '
                         'synthetic shard when absent)')
    ap.add_argument('--shard-records', type=int, default=1024)
    ap.add_argument('--detector-ckpt', default=None)
    ap.add_argument('--detector-downscale', type=int, default=None,
                    help='two-stage mode: average-pool factor for the '
                         'detector input; defaults to the detector.json '
                         'sidecar from its training run (4 if neither)')
    ap.add_argument('--batch', type=int, default=None,
                    help='override the pipeline batch size (default 256)')
    ap.add_argument('--host-crop', action='store_true',
                    help='system mode: crop+resize on the C++ loader '
                         'threads (65 KB/img H2D instead of 2.3 MB)')
    ap.add_argument('--no-host-crop', action='store_true',
                    help='train-system mode: ship full frames and crop '
                         'on device (host-crop is that mode\'s default)')
    ap.add_argument('--png-shard', action='store_true',
                    help='system/train-system modes: pack the shard as '
                         'PNG streams (the reference\'s on-disk encoding, '
                         'data_load4.py:47-51) instead of raw frames — '
                         'measures the per-epoch host decode cost the '
                         'reference pays')
    ap.add_argument('--int8', action='store_true',
                    help='serve the head conv in int8 '
                         '(models/layers.py INT8_SERVING; experimental)')
    ap.add_argument('--nhwc-decode', choices=['auto', 'on', 'off'],
                    default='auto',
                    help='force the channels-last decode path (on) or the '
                         'transpose+Pallas path (off) in the serving tail')
    ap.add_argument('--device-deadline', type=float, default=900.0,
                    help='seconds to wait for the default backend before '
                         'reporting an error line instead of hanging '
                         '(the axon TPU tunnel can be down)')
    args = ap.parse_args(argv)
    if args.batch:
        global BATCH
        BATCH = args.batch
    if args.nhwc_decode != 'auto':
        from esa_pose_estimation_tpu.ops import peak as _peak
        _peak.NHWC_DECODE = args.nhwc_decode == 'on'
    if args.int8:
        from esa_pose_estimation_tpu.models import layers as _layers
        _layers.INT8_SERVING = True

    # The axon tunnel makes jax.devices() HANG (not raise) when its link
    # is down; probe out-of-process first so a dead tunnel yields an
    # honest error record rather than a wedged benchmark process.
    from esa_pose_estimation_tpu.utils.device_probe import (
        await_default_backend)
    if await_default_backend(
            args.device_deadline,
            probe_timeout_s=min(60.0, args.device_deadline)) is None:
        print(json.dumps({
            'metric': f'benchmark unavailable (--mode {args.mode})',
            'value': 0.0,
            'unit': 'img/s',
            'vs_baseline': 0.0,
            'error': 'default JAX backend (axon TPU tunnel) unreachable '
                     f'after {args.device_deadline:.0f}s of retries',
        }))
        return
    if args.mode == 'system':
        out = bench_system(args.shard, args.shard_records,
                           host_crop=args.host_crop,
                           png_shard=args.png_shard)
    elif args.mode == 'voting':
        out = bench_voting()
    elif args.mode == 'train':
        out = bench_train()
    elif args.mode == 'train-system':
        out = bench_train_system(args.shard, args.shard_records,
                                 host_crop=not args.no_host_crop,
                                 png_shard=args.png_shard)
    elif args.mode == 'two-stage':
        out = bench_two_stage(args.detector_ckpt, args.detector_downscale)
    else:
        out = bench_compute()
    print(json.dumps(out))


if __name__ == '__main__':
    main()
