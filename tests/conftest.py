"""Test configuration: run on 8 virtual CPU devices so multi-chip sharding
paths (mesh + pjit/shard_map) are exercised without TPU hardware.

Note: this image preloads the 'axon' TPU-tunnel JAX plugin from
sitecustomize (jax is already imported at interpreter start with
JAX_PLATFORMS=axon), so env vars alone cannot select the CPU backend —
``jax.config.update('jax_platforms', ...)`` after import is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


# ---------------------------------------------------------------------------
# Test tiers.  The compile-heavy end-to-end suites dominate wall time on a
# 1-core CPU host (measured per-module: sharded_serving 321s, voting+pnp
# ~8 min, pipeline 206s, linemod_real 180s, cli 169s, models 158s, train
# 132s, torch_import 108s, forward_parity 93s, detector 92s).  They carry
# the `slow` marker, applied per-module here so the list has one home:
#
#   pytest -m "not slow"   # fast tier, < 5 min (README "Testing")
#   pytest                 # everything
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_artifact",
    "test_branch_chain",
    "test_cli",
    "test_detector",
    "test_dress_rehearsal",
    "test_linemod_real",
    "test_models",
    "test_pipeline",
    "test_pnp",
    "test_reference_forward_parity",
    "test_sharded_serving",
    "test_torch_import",
    "test_train",
    "test_train_linemod",
    "test_voting",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module and item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
