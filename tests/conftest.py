"""Test configuration.

Multi-chip sharding tests run on a host-emulated 8-device CPU mesh (the
standard way to test pjit/shard_map collectives without a pod); the flags
must be set before jax initialises, hence here.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")
