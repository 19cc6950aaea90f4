"""Numeric backend selection for the DSL engine.

The framework ships two interchangeable engines for the interpreter's
register math (SURVEY.md §7 architecture stance):

* ``numpy``  — complex128 host oracle: bit-exact conformance surface,
  fastest for the small registers typical of .qb programs (default).
* ``jax``    — the same contraction code under jax.numpy: jit-able,
  device-placed, and the door to the sharded/planar executors for large
  registers.

Only the active array module changes; every engine function in
:mod:`qbot_tpu.ops` is written against the generic ``xp`` interface.
"""
from __future__ import annotations

import numpy as np

_ACTIVE = "numpy"
_DTYPE: str | None = None      # None = backend default; "c64" | "c128"


def set_backend(name: str) -> None:
    global _ACTIVE
    if name not in ("numpy", "jax"):
        raise ValueError(f"unknown backend {name!r} (expected numpy|jax)")
    _ACTIVE = name


def set_dtype(name: str | None) -> None:
    """Select the register's complex precision (CLI ``--dtype``).

    ``None`` keeps the backend default (complex128 numpy / complex64 jax).
    """
    global _DTYPE
    if name not in (None, "c64", "c128"):
        raise ValueError(f"unknown dtype {name!r} (expected c64|c128)")
    _DTYPE = name


def complex_dtype():
    """The active complex dtype for register states."""
    if _DTYPE == "c64":
        return np.complex64
    if _DTYPE == "c128":
        return np.complex128
    return np.complex64 if _ACTIVE == "jax" else np.complex128


def dtype_override():
    """The explicitly requested complex dtype, or None when defaulted."""
    return None if _DTYPE is None else complex_dtype()


def get_backend() -> str:
    return _ACTIVE


def xp():
    """The active array namespace (numpy or jax.numpy)."""
    if _ACTIVE == "jax":
        import jax.numpy as jnp
        return jnp
    return np


def is_array(v) -> bool:
    """True for any engine array (numpy ndarray or jax Array)."""
    if isinstance(v, np.ndarray):
        return True
    try:
        import jax
        return isinstance(v, jax.Array)
    except Exception:  # pragma: no cover
        return False


def to_numpy(v):
    return np.asarray(v)
