"""Persistent XLA compilation cache.

On the axon TPU backend, compilation runs on a remote terminal through
the tunnel: a fresh 26-qubit executable takes minutes of wall clock
(BENCH_r01 recorded 184 s) and the latency is shared-service noise, not
program complexity.  JAX's persistent compilation cache eliminates it
entirely across processes — measured 202 s cold → 0.33 s warm for the
same program — so every entry point enables it by default.

The cache lives in ``.jax_cache/`` at the repo root (override with
``QBOT_TPU_COMPILE_CACHE``; set it to ``off`` to disable).
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parents[2] / ".jax_cache"
_enabled = False


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory, or None when disabled via the
    ``QBOT_TPU_COMPILE_CACHE=off`` environment variable.
    """
    global _enabled
    env = os.environ.get("QBOT_TPU_COMPILE_CACHE")
    if env == "off":
        return None
    target = path or env or str(_DEFAULT)
    if _enabled:
        return target
    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    # default min compile time is 1s; axon remote compiles are never that
    # fast for real programs, but keep tiny helper jits out of the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
    return target


def cache_is_warm(path: str | None = None) -> bool:
    """True when the cache directory already holds compiled executables."""
    env = os.environ.get("QBOT_TPU_COMPILE_CACHE")
    if env == "off":
        return False
    target = Path(path or env or _DEFAULT)
    return target.is_dir() and any(target.iterdir())
