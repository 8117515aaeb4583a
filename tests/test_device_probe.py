"""The device probe must return within its deadline no matter what the
default backend does (the axon TPU tunnel hangs jax.devices() when its
link is down — see utils/device_probe.py docstring)."""

import time

from esa_pose_estimation_tpu.utils import device_probe


def test_probe_bounded_time():
    t0 = time.monotonic()
    n = device_probe.default_backend_device_count(timeout_s=8.0)
    elapsed = time.monotonic() - t0
    # Child import + backend init can take ~10s when healthy; the bound
    # we guarantee is deadline + small cleanup slack, never a hang.
    assert elapsed < 45.0
    assert n is None or n >= 1


def test_await_gives_up_by_deadline():
    t0 = time.monotonic()
    n = device_probe.await_default_backend(
        total_deadline_s=6.0, probe_timeout_s=3.0, retry_interval_s=2.0,
        verbose=False)
    elapsed = time.monotonic() - t0
    assert elapsed < 30.0
    assert n is None or n >= 1
