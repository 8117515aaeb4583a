"""Profile the serving pipeline and print a device-time op breakdown.

Runs the bench.py compute pipeline under ``jax.profiler.trace``, then
parses the Perfetto trace (``*.trace.json.gz``) and aggregates device-side
'X' events by HLO op, printing the top ops and category totals.  This is
the measurement behind QUALITY.md's roofline analysis — rerun it after any
model/ops change to see where the milliseconds went.

Usage:  python scripts/profile_pipeline.py [--batch 256] [--iters 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def run_trace(batch: int, iters: int, log_dir: str) -> None:
    import bench
    bench.BATCH = batch
    pts, frames, bboxes = bench._staged_inputs(batch)
    variables, pipeline, _ = bench.build_pipeline()
    keys = list(jax.random.split(jax.random.PRNGKey(0), iters + 1))
    R, _ = pipeline(variables, frames, bboxes, pts, keys[-1])
    R.block_until_ready()
    jax.profiler.start_trace(log_dir)
    for i in range(iters):
        R, _ = pipeline(variables, frames, bboxes, pts, keys[i])
    R.block_until_ready()
    jax.profiler.stop_trace()


def device_pids(trace: dict) -> set[int]:
    """Pids whose process name looks like a TPU/accelerator, not host."""
    names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            names[ev['pid']] = ev['args'].get('name', '')
    return {pid for pid, n in names.items()
            if ('TPU' in n or 'tpu' in n or 'XLA' in n.upper()
                or 'device' in n.lower()) and 'host' not in n.lower()}


CATEGORIES = [
    ('conv custom-call', re.compile(r'^(%?)(custom-call|convolution)')),
    ('fusion', re.compile(r'^(%?)(loop_)?fusion')),
    ('while (solvers)', re.compile(r'^(%?)while')),
    ('reduce', re.compile(r'^(%?)(reduce|all-reduce)')),
    ('copy/transpose', re.compile(r'^(%?)(copy|transpose|bitcast)')),
    ('dynamic-slice/update', re.compile(r'^(%?)dynamic')),
    ('sort/scatter/gather', re.compile(r'^(%?)(sort|scatter|gather)')),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.match(name):
            return cat
    return 'other'


def analyze(log_dir: str, iters: int, batch: int) -> None:
    paths = glob.glob(os.path.join(log_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    assert paths, f'no trace under {log_dir}'
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    pids = device_pids(trace)
    per_op = defaultdict(float)
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'X' and ev.get('pid') in pids:
            per_op[ev['name']] += ev.get('dur', 0.0)  # microseconds

    total_us = sum(per_op.values())
    per_cat = defaultdict(float)
    for name, us in per_op.items():
        per_cat[categorize(name)] += us
    scale = 1e3 * iters  # us -> ms per iteration
    print(f'# device total: {total_us / scale:.2f} ms/iter '
          f'(batch {batch}, {total_us / scale / batch * 1e3:.1f} us/img)')
    print('\n## by category (ms/iter)')
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f'{us / scale:9.3f}  {cat}')
    print('\n## top 40 ops (ms/iter)')
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f'{us / scale:9.3f}  {name[:110]}')


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--log-dir', default='/tmp/ept_profile')
    ap.add_argument('--analyze-only', action='store_true')
    ap.add_argument('--int8', action='store_true',
                    help='trace the int8-head serving program instead of '
                         'bf16 (the attribution behind the QUALITY int8 '
                         'verdict)')
    args = ap.parse_args()
    if args.int8:
        from esa_pose_estimation_tpu.models import layers as _layers
        _layers.INT8_SERVING = True
    if not args.analyze_only:
        run_trace(args.batch, args.iters, args.log_dir)
    analyze(args.log_dir, args.iters, args.batch)


if __name__ == '__main__':
    main()
