"""Driver entry-point contract tests (CPU, emulated mesh)."""
import sys

import numpy as np
import pytest

import jax


sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (2**10,)
    assert abs(out.sum() - 1.0) < 1e-2


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 emulated devices")
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    graft.dryrun_multichip(2)
