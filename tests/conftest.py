"""Test configuration.

Tests always run on CPU-jax with x64 enabled — numeric assertions are
against complex128 oracles, and sharding tests use a host-emulated 8-device
CPU mesh (the standard way to exercise pjit/shard_map collectives without a
pod).  The axon TPU plugin ignores the JAX_PLATFORMS env var, so the config
must be updated through jax.config before any backend initialises; the
real-TPU path is exercised by bench.py / __graft_entry__.py in a separate
process.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
