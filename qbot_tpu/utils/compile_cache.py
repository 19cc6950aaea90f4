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
    """True when the cache directory already holds compiled executables.

    NOTE: this says nothing about whether a *given program* will hit the
    cache — use :class:`CacheHitProbe` for honest per-workload evidence
    (round-2 lesson: BENCH_r02 reported "warm" alongside a 169 s compile
    because the directory was non-empty with other programs' entries).
    """
    env = os.environ.get("QBOT_TPU_COMPILE_CACHE")
    if env == "off":
        return False
    target = Path(path or env or _DEFAULT)
    return target.is_dir() and any(target.iterdir())


_counters = {"hits": 0, "misses": 0}
_listener_installed = False


def _cache_event_listener(event: str, **kwargs) -> None:
    if event == "/jax/compilation_cache/cache_hits":
        _counters["hits"] += 1
    elif event == "/jax/compilation_cache/cache_misses":
        _counters["misses"] += 1


def install_cache_hit_listener() -> None:
    """Count JAX's persistent-cache hit/miss monitoring events (idempotent)."""
    global _listener_installed
    if _listener_installed:
        return
    from jax._src import monitoring

    monitoring.register_event_listener(_cache_event_listener)
    _listener_installed = True


class CacheHitProbe:
    """Context manager recording whether compiles inside it hit the cache.

    Evidence comes from JAX's own monitoring events
    (``/jax/compilation_cache/cache_hits`` / ``cache_misses``), not from
    directory heuristics.  ``hits``/``misses`` are the deltas observed
    inside the block; ``verdict()`` renders them for bench JSON.
    """

    def __enter__(self):
        install_cache_hit_listener()
        self._h0 = _counters["hits"]
        self._m0 = _counters["misses"]
        return self

    def __exit__(self, *exc):
        self.hits = _counters["hits"] - self._h0
        self.misses = _counters["misses"] - self._m0
        return False

    def verdict(self) -> str:
        if self.misses == 0 and self.hits > 0:
            return "hit"
        if self.hits == 0 and self.misses > 0:
            return "miss"
        if self.hits or self.misses:
            return f"partial ({self.hits} hits, {self.misses} misses)"
        return "no-compiles"
