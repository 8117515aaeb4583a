"""Full-scale dress rehearsal of the production chain on real hardware.

Runs the EXACT route real SPEED data takes, at SPEED scale (1920x1200
frames, flagship hrnet_esa), end to end from disk, timing every stage
(VERDICT r4 item 1; reference workflow main.py:237-424 -> demo.py ->
val.py:94-336):

  1. export_reference_layout  — images/train|test|real_test JPEGs +
     train|test|real_test.{json,pkl} in the reference's exact layout
  2. records_from_pickle -> write_shard_from_records  — pack the train
     split into one SPD1 shard for the C++ native loader
  3. cli/train --train-shard  — sharded train step over the native
     loader with double-buffered device prefetch, eval epochs + best
     gates + checkpoints
  4. cli/evaluate  — labeled SPEED scores from best_rotate
  5. cli/submit    — test + real_test partitions -> leaderboard CSV

Prints one JSON object with per-stage wall-clock and the final scores;
the QUALITY.md "dress rehearsal" row records the measured run.

Usage (TPU host):
  python scripts/dress_rehearsal.py --root /tmp/speed_dress \
      [--n-train 480 --epochs 40]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('EPT_COMPILE_CACHE',
                                 os.path.join(_REPO_ROOT, '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--root', default='/tmp/speed_dress')
    ap.add_argument('--workdir', default='/tmp/speed_dress/run')
    ap.add_argument('--n-train', type=int, default=480)
    ap.add_argument('--n-test', type=int, default=64)
    ap.add_argument('--n-real-test', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=120)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--log-every', type=int, default=15)
    ap.add_argument('--skip-export', action='store_true',
                    help='reuse an existing --root dataset + shard')
    ap.add_argument('--png-shard', action='store_true',
                    help='pack the shard as PNG streams (the reference '
                         'on-disk encoding) instead of raw frames; the '
                         'default raw layout is the production ingest '
                         'format — PNG re-decode costs ~100 ms/frame/core '
                         'every epoch and starves the chip on few-core '
                         'hosts (measured 75 s/epoch vs ~10 s)')
    ap.add_argument('--no-host-crop', dest='host_crop',
                    action='store_false',
                    help='crop on device from full shipped frames instead '
                         'of on the C++ loader threads (host-crop is the '
                         'production default: 65 KB crops, not 2.3 MB '
                         'frames, over the host-device link)')
    ap.add_argument('--no-augment-geom', dest='augment_geom',
                    action='store_false',
                    help='train WITHOUT crop-space flip/rotation '
                         'augmentation (run-1 regime: at rehearsal scale '
                         '— a few hundred fixed frames x many epochs — '
                         'this memorizes, held-out 0.337 vs 0.0105)')
    ap.add_argument('--eval-every', type=int, default=5,
                    help='epochs between held-out SPEED evals (disk evals '
                         'dominate wall-clock on small shard datasets)')
    args = ap.parse_args(argv)

    from esa_pose_estimation_tpu.cli import evaluate as eval_cli
    from esa_pose_estimation_tpu.cli import submit as submit_cli
    from esa_pose_estimation_tpu.cli import train as train_cli
    from esa_pose_estimation_tpu.data import shards, speed, speed_gen

    timing: dict[str, float] = {}
    shard = os.path.join(args.root, 'train.spd1')

    if not args.skip_export:
        t0 = time.time()
        print('exporting reference-layout dataset ...', flush=True)
        speed_gen.export_reference_layout(
            args.root, n_train=args.n_train, n_test=args.n_test,
            n_real_test=args.n_real_test, height=1200, width=1920,
            n_kp=30, seed=0, batch=8)
        timing['export_s'] = round(time.time() - t0, 1)

    if not os.path.exists(shard):
        t0 = time.time()
        print('packing SPD1 shard ...', flush=True)
        records = speed.records_from_pickle(
            os.path.join(args.root, 'train.pkl'),
            os.path.join(args.root, 'images', 'train'))
        shards.write_shard_from_records(shard, records, height=1200,
                                        width=1920,
                                        compressed=args.png_shard)
        timing['shard_s'] = round(time.time() - t0, 1)

    t0 = time.time()
    # Held-out per-epoch eval + geometric augmentation are the run-2
    # production regime (QUALITY.md §7): without them the per-epoch eval
    # reads the train shard itself and the best gates happily keep
    # memorized weights (run 1: train-split 0.0029 vs held-out 0.337).
    train_cli.main([
        '--workdir', args.workdir, '--epochs', str(args.epochs),
        '--batch-size', str(args.batch_size),
        '--train-shard', shard, '--loader-threads', '8',
        '--test-pkl', os.path.join(args.root, 'test.pkl'),
        '--image-root', os.path.join(args.root, 'images', 'test'),
        '--eval-every', str(args.eval_every),
        '--no-panels', '--log-every', str(args.log_every)]
        + (['--host-crop'] if args.host_crop else [])
        + (['--augment-geom'] if args.augment_geom else []))
    timing['train_s'] = round(time.time() - t0, 1)

    t0 = time.time()
    result = eval_cli.main([
        '--workdir', args.workdir,
        '--test-pkl', os.path.join(args.root, 'test.pkl'),
        '--image-root', os.path.join(args.root, 'images', 'test'),
        '--checkpoint', 'best_rotate',
        '--batch-size', str(args.batch_size)])
    timing['evaluate_s'] = round(time.time() - t0, 1)

    t0 = time.time()
    csv_path = submit_cli.main([
        '--workdir', args.workdir,
        '--test-pkl', os.path.join(args.root, 'test.pkl'),
        '--image-root', os.path.join(args.root, 'images', 'test'),
        '--real-test-pkl', os.path.join(args.root, 'real_test.pkl'),
        '--real-image-root', os.path.join(args.root, 'images',
                                          'real_test'),
        '--checkpoint', 'best_rotate',
        '--batch-size', str(args.batch_size), '--suffix', 'rehearsal'])
    timing['submit_s'] = round(time.time() - t0, 1)

    with open(csv_path) as f:
        rows = list(csv.reader(f))
    n_expected = args.n_test + args.n_real_test
    out = {
        'timing': timing,
        'total_s': round(sum(timing.values()), 1),
        'eval_score_t': round(result['score_t'], 5),
        'eval_score_r': round(result['score_r'], 5),
        'eval_speed': round(result['speed'], 5),
        'eval_pix_err': round(result['pix_err'], 3),
        'csv_rows': len(rows),
        'csv_rows_expected': n_expected,
        'csv_schema_ok': all(len(r) == 8 for r in rows),
        'csv_path': csv_path,
    }
    print(json.dumps(out))
    return out


if __name__ == '__main__':
    main()
