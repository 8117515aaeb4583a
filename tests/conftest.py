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
