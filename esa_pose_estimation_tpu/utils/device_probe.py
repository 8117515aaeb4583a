"""Hang-proof probing of the default JAX backend.

This image reaches its TPU chip through an 'axon' network tunnel whose
plugin is preloaded at interpreter start (``jax_platforms='axon,cpu'``).
When the tunnel link is down, ``jax.devices()`` HANGS rather than raises
— it never falls through to the cpu entry — so anything that must not
wedge (the driver-run benchmark, the multi-chip dry run) needs to probe
device availability out-of-process with a hard deadline.

The probe child writes its device count to a file instead of a pipe:
the axon plugin spawns helper processes that inherit stdout/stderr, so
``communicate()``-style reads block even after the child itself is
killed.  The whole process group is killed at the deadline.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import tempfile
import time


def default_backend_device_count(timeout_s: float = 60.0) -> int | None:
    """Device count of the default backend, or None if unreachable.

    Runs ``len(jax.devices())`` in a disposable subprocess with a hard
    deadline; a hang, crash, or unparsable result all map to None.
    """
    with tempfile.NamedTemporaryFile('r', suffix='.txt', delete=False) as f:
        out_path = f.name
    code = ("import jax; open(%r, 'w').write(str(len(jax.devices())))"
            % out_path)
    proc = subprocess.Popen(
        [sys.executable, '-c', code], stdin=subprocess.DEVNULL,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    deadline = time.monotonic() + timeout_s
    try:
        while proc.poll() is None and time.monotonic() < deadline:
            time.sleep(0.25)
        if proc.poll() is None or proc.returncode != 0:
            return None
        with open(out_path) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None
    finally:
        # Always sweep the probe's process group: the plugin's helper
        # processes can outlive a child that exited on its own (they are
        # the reason for the new session), and a killed child must be
        # reaped or it lingers as a zombie.
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            proc.wait(timeout=5)
        except Exception:
            pass
        try:
            os.unlink(out_path)
        except OSError:
            pass


def await_default_backend(total_deadline_s: float = 900.0,
                          probe_timeout_s: float = 60.0,
                          retry_interval_s: float = 30.0,
                          verbose: bool = True) -> int | None:
    """Wait (with retries) until the default backend answers.

    The axon tunnel flaps; a benchmark kicked off during an outage should
    keep retrying for a while rather than either hanging forever or
    failing on the first probe.  Returns the device count, or None once
    ``total_deadline_s`` has elapsed without a successful probe.
    """
    start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        n = default_backend_device_count(probe_timeout_s)
        if n is not None:
            return n
        elapsed = time.monotonic() - start
        if elapsed + retry_interval_s >= total_deadline_s:
            return None
        if verbose:
            print(f'# default JAX backend unreachable '
                  f'(probe {attempt}, {elapsed:.0f}s elapsed); '
                  f'retrying in {retry_interval_s:.0f}s', flush=True)
        time.sleep(retry_interval_s)
