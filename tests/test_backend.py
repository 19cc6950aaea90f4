"""The jax engine backend runs the same DSL programs as the numpy oracle."""
import numpy as np
import pytest

from qbot_tpu import backend, executeTxt

PROGRAMS = [
    "qset tensorProd(comp[0], hada[1])\ngate hadamardGate ; 0",
    "qset tensorProd(comp[1], comp[0])\ngate pauliXGate ; 1 ; 0",
    "qset bell[0]\nmeas x ; bell",
    "qset tensorProd(comp[0], comp[1], hada[0])\ndisc [1]",
    "qset tensorProd(comp[0], comp[0])\nqset comp[1] ; ProbVal([0.5, 0.5], [0, 1])",
    "qset tensorProd(comp[0], comp[1])\nswap 0 ; 1",
]


@pytest.fixture
def jax_backend():
    backend.set_backend("jax")
    try:
        yield
    finally:
        backend.set_backend("numpy")


@pytest.mark.parametrize("src", PROGRAMS, ids=range(len(PROGRAMS)))
def test_jax_backend_matches_numpy(jax_backend, src):
    backend.set_backend("numpy")
    want = executeTxt(src)
    backend.set_backend("jax")
    got = executeTxt(src)
    np.testing.assert_allclose(np.asarray(got["state"]),
                               np.asarray(want["state"]), atol=1e-10)
    if "x" in want:
        np.testing.assert_allclose(got["x"].probs, want["x"].probs, atol=1e-10)


def test_bad_backend_rejected():
    with pytest.raises(ValueError):
        backend.set_backend("cuda")
