"""Pallas kernel tests (interpret mode on CPU) vs the XLA einsum path."""
import numpy as np
import pytest

import jax.numpy as jnp

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.circuit import Circuit, random_circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import (
    apply_plan_planar,
    from_planar,
    zero_state_planar,
)
from qbot_tpu.tpu.simulator import apply_plan, zero_state


@pytest.fixture
def interpret_kernels():
    kernels.set_kernel_mode("interpret")
    try:
        yield
    finally:
        kernels.set_kernel_mode("auto")


def _rand_planar(n, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi /= np.linalg.norm(psi)
    return psi


class TestPlanarWindowApply:
    def test_left_multiply_geometry(self, interpret_kernels):
        """Middle window (a>1, B>=128): Pallas left-multiply kernel."""
        n, start, width = 10, 1, 2     # a=2, D=4, B=128
        psi = _rand_planar(n, 1)
        W = np.linalg.qr(np.random.default_rng(2).normal(size=(4, 4))
                         + 1j * np.random.default_rng(3).normal(size=(4, 4)))[0]
        planar = jnp.asarray(np.stack([psi.real, psi.imag]), dtype=jnp.float32)
        got = kernels.planar_window_apply(
            planar, n, start, width,
            jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32))
        # oracle
        t = psi.reshape(2, 4, 128)
        want = np.einsum("ij,ajb->aib", W, t).reshape(-1)
        np.testing.assert_allclose(from_planar(np.asarray(got)), want,
                                   atol=1e-5)

    def test_right_multiply_geometry(self, interpret_kernels):
        """Trailing window (B==1): Pallas right-multiply kernel."""
        n, start, width = 10, 3, 7     # a=8, D=128, B=1
        psi = _rand_planar(n, 4)
        rng = np.random.default_rng(5)
        W = np.linalg.qr(rng.normal(size=(128, 128))
                         + 1j * rng.normal(size=(128, 128)))[0]
        planar = jnp.asarray(np.stack([psi.real, psi.imag]), dtype=jnp.float32)
        got = kernels.planar_window_apply(
            planar, n, start, width,
            jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32))
        want = np.einsum("ij,aj->ai", W, psi.reshape(8, 128)).reshape(-1)
        np.testing.assert_allclose(from_planar(np.asarray(got)), want,
                                   atol=1e-4)

    def test_full_circuit_with_kernels(self, interpret_kernels):
        n = 10
        c = random_circuit(n, 2, seed=6)
        plan = compile_circuit(c)
        want = np.asarray(apply_plan(zero_state(n, jnp.complex128), plan))
        got = apply_plan_planar(zero_state_planar(n), plan)
        np.testing.assert_allclose(from_planar(np.asarray(got)), want,
                                   atol=2e-5)

    def test_mode_validation(self):
        with pytest.raises(ValueError):
            kernels.set_kernel_mode("bogus")
        assert kernels.kernel_mode() == "auto"
