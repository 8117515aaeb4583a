"""Multi-host (multi-process) distribution tests.

The reference tops out at single-process ``torch.nn.DataParallel``
(reference: main.py:254); the framework extends past it with
``jax.distributed`` multi-controller SPMD (parallel/distributed.py).
These tests verify the pieces:

* the ingest partition arithmetic (Python ``local_slice`` and the native
  C++ loader's record-subrange mode) produces disjoint, exhaustive,
  order-preserving slices;
* a REAL 2-process run — subprocess pair over a localhost coordinator,
  CPU backend with 4 virtual devices each, Gloo collectives — trains
  the shard-ingest path end to end and reproduces the single-process
  8-device run's per-epoch losses (the VERDICT r3 item-3 parity bar).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))

DRIVER = """
import sys, os
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count={ndev}')
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)
if {cache!r}:
    # XLA's CPU Gloo backend hardcodes a 30 s key-exchange deadline at
    # communicator creation, so both controllers must reach their first
    # collective within 30 s of each other.  A shared persistent compile
    # cache removes the dominant skew source (minutes of XLA compiles on
    # this 1-core host): on a cache hit the first launch follows the
    # pre_train barrier within milliseconds.
    jax.config.update('jax_compilation_cache_dir', {cache!r})
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
from esa_pose_estimation_tpu.cli import train as train_cli
train_cli.main(sys.argv[1:])
"""


class TestLocalSlice:
    def test_disjoint_exhaustive_balanced(self):
        from esa_pose_estimation_tpu.parallel.distributed import local_slice
        records = list(range(23))
        pieces = [local_slice(records, pid, 4) for pid in range(4)]
        assert sum(pieces, []) == records          # order-preserving union
        sizes = [len(p) for p in pieces]
        assert max(sizes) - min(sizes) <= 1        # balanced

    def test_bad_process_id(self):
        from esa_pose_estimation_tpu.parallel.distributed import local_slice
        with pytest.raises(ValueError):
            local_slice([1, 2, 3], 2, 2)


class TestNativeLoaderSubrange:
    """The C++ loader's process_id/process_count mode must serve exactly
    host i's contiguous record slice (shard_loader.cpp:loader_open3)."""

    def test_slices_partition_the_shard(self, tmp_path):
        from esa_pose_estimation_tpu.data.native_loader import (
            NativeBatchLoader)
        from esa_pose_estimation_tpu.data import shards
        shard = str(tmp_path / 's.spd1')
        shards.write_synthetic_shard(shard, 12, height=96, width=128,
                                     n_kp=6, batch=4)
        full = NativeBatchLoader(shard, 4, n_threads=2, shuffle=False)
        all_names = [n for b in full for n in b['name']]
        full.close()
        assert len(all_names) == 12

        got = []
        for pid in range(3):
            part = NativeBatchLoader(shard, 4, n_threads=2, shuffle=False,
                                     process_id=pid, process_count=3)
            assert len(part) == 1                  # 4 local records / 4
            got += [n for b in part for n in b['name']]
            part.close()
        assert got == all_names                    # disjoint + exhaustive

    def test_shuffle_stays_inside_slice(self, tmp_path):
        from esa_pose_estimation_tpu.data.native_loader import (
            NativeBatchLoader)
        from esa_pose_estimation_tpu.data import shards
        shard = str(tmp_path / 's2.spd1')
        shards.write_synthetic_shard(shard, 8, height=96, width=128,
                                     n_kp=6, batch=4)
        full = NativeBatchLoader(shard, 4, n_threads=2, shuffle=False)
        all_names = [n for b in full for n in b['name']]
        full.close()
        part = NativeBatchLoader(shard, 4, n_threads=2, shuffle=True,
                                 seed=7, process_id=1, process_count=2)
        names = [n for b in part for n in b['name']]
        part.close()
        assert sorted(names) == sorted(all_names[4:])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_train(driver: str, workdir: str, shard: str, mp_args=(),
               timeout=540):
    args = [sys.executable, driver,
            '--workdir', workdir, '--tiny', '--epochs', '3',
            '--batch-size', '16', '--crop-size', '32',
            '--train-shard', shard, '--loader-threads', '2',
            '--no-shuffle', '--no-panels', '--log-every', '1',
            '--host-crop', *mp_args]
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    return subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True), timeout


def _losses(workdir: str) -> np.ndarray:
    rows = open(os.path.join(workdir, 'log_esa.txt')).read().strip()
    return np.array([float(r.split('\t')[2])
                     for r in rows.split('\n')[1:]])


@pytest.mark.slow
class TestTwoProcessTraining:
    def test_loss_parity_with_single_process(self, tmp_path):
        """2 controllers x 4 virtual devices == 1 controller x 8 devices:
        per-host C++ loader slices -> stage_global batch assembly ->
        the SAME sharded train step, per-epoch losses equal up to bf16
        cross-host (Gloo) vs in-process reduction-order noise."""
        from esa_pose_estimation_tpu.data import shards
        shard = str(tmp_path / 'train.spd1')
        # ONE global batch per epoch: the single-process batch [0..15]
        # and the 2-process concat([0..7], [8..15]) are then the same
        # records in the same order, so losses are comparable stepwise.
        shards.write_synthetic_shard(shard, 16, height=192, width=256,
                                     n_kp=6, batch=8)

        cache = str(tmp_path / 'xla_cache')
        drv2 = str(tmp_path / 'drv2.py')
        with open(drv2, 'w') as f:
            f.write(DRIVER.format(ndev=4, repo=REPO, cache=cache))
        # the single-process warmer shares the pair's compile cache: its
        # 8-device partitioned programs are keyed identically to the
        # 2x4-device pair's (same HLO, same logical device count), so any
        # hits cut the pair's concurrent-compile wall time on this 1-core
        # host
        drv1 = str(tmp_path / 'drv1.py')
        with open(drv1, 'w') as f:
            f.write(DRIVER.format(ndev=8, repo=REPO, cache=cache))

        # single-process first: it doubles as an import/page-cache warmer
        # so the 2-process pair only competes with itself for the core
        w_sp = str(tmp_path / 'sp')
        ps, timeout = _run_train(drv1, w_sp, shard)
        outs, _ = ps.communicate(timeout=timeout)
        assert ps.returncode == 0, f'single-proc failed:\n{outs[-3000:]}'

        # The structural fix for Gloo's hardcoded 30 s communicator
        # rendezvous is in the driver itself: cli/train AOT-compiles the
        # sharded step on every controller and only THEN barriers
        # (parallel/distributed.py:compile_aligned), so the first
        # collective launches aligned within milliseconds no matter how
        # unevenly this 1-core host schedules the two concurrent
        # compiles.  The retry loop is belt-and-braces for residual
        # environmental flake (e.g. the coordinator port racing another
        # suite); each attempt also leaves the shared compile cache
        # warmer than the last.
        import shutil
        attempts = 3
        for attempt in range(attempts):
            w_mp = str(tmp_path / 'mp')
            shutil.rmtree(w_mp, ignore_errors=True)
            port = _free_port()
            coord = ['--coordinator', f'127.0.0.1:{port}',
                     '--num-processes', '2']
            p0, timeout = _run_train(drv2, w_mp, shard,
                                     coord + ['--process-id', '0'])
            p1, _ = _run_train(drv2, w_mp, shard,
                               coord + ['--process-id', '1'])
            out0, _ = p0.communicate(timeout=timeout)
            out1, _ = p1.communicate(timeout=timeout)
            if p0.returncode == 0 and p1.returncode == 0:
                break
            assert attempt < attempts - 1, \
                f'proc0 rc={p0.returncode}:\n{out0[-3000:]}\n' \
                f'proc1 rc={p1.returncode}:\n{out1[-3000:]}'

        lmp, lsp = _losses(w_mp), _losses(w_sp)
        assert lmp.shape == lsp.shape == (3,)
        np.testing.assert_allclose(lmp, lsp, rtol=2e-3)
        # secondary controller kept its artifacts out of the primary's dir
        assert os.path.exists(os.path.join(w_mp, 'proc1', 'log_esa.txt'))
