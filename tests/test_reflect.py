"""Householder-reflection detection (A-layer · flip · A†-layer → ReflectStep)
and its executors, vs the unoptimised window path."""
import numpy as np
import pytest

import jax.numpy as jnp

from qbot_tpu.tpu.circuit import Circuit, grover_circuit
from qbot_tpu.tpu.compiler import ReflectStep, compile_circuit
from qbot_tpu.tpu.planar import (
    apply_plan_planar,
    apply_plan_density_planar,
    from_planar,
    zero_density_planar,
    zero_state_planar,
)
from qbot_tpu.tpu.simulator import apply_plan, apply_plan_density, zero_state


def _h_flip_h(n, oracle, flip=0):
    c = Circuit(n)
    c.phase_flip(oracle)
    for q in range(n):
        c.h(q)
    c.phase_flip(flip)
    for q in range(n):
        c.h(q)
    return c


def _reflect_free(circ, window=7):
    """Compile with reflection detection manually disabled: windows only."""
    from qbot_tpu.tpu import compiler

    orig = compiler._detect_reflections
    compiler._detect_reflections = lambda steps, n: steps
    try:
        return compile_circuit(circ, window=window)
    finally:
        compiler._detect_reflections = orig


class TestDetection:
    def test_grover_body_detected(self):
        plan = compile_circuit(_h_flip_h(10, oracle=123))
        kinds = [type(s).__name__ for s in plan.steps]
        # the oracle flip fuses INTO the reflection (O(1) scalar correction)
        assert kinds == ["ReflectStep"]
        refl = plan.steps[0]
        assert refl.pre_flips == (123,)
        # the reflection about H|0..0> is the uniform state: all factors +
        v = refl.factors[0]
        for f in refl.factors[1:]:
            v = np.kron(v, f)
        np.testing.assert_allclose(v, np.full(2**10, 2**-5), atol=1e-9)

    def test_full_grover_circuit(self):
        plan = compile_circuit(grover_circuit(12, marked=777, iterations=3))
        assert sum(isinstance(s, ReflectStep) for s in plan.steps) == 3

    def test_non_inverse_layers_not_detected(self):
        n = 8
        c = Circuit(n)
        for q in range(n):
            c.h(q)
        c.phase_flip(0)
        for q in range(n):
            c.x(q)                      # X != H^{-1}
        plan = compile_circuit(c)
        assert not any(isinstance(s, ReflectStep) for s in plan.steps)

    def test_nonzero_flip_index(self):
        # reflection about H|idx> for idx != 0 must also be exact
        n = 9
        plan = compile_circuit(_h_flip_h(n, oracle=3, flip=37))
        assert any(isinstance(s, ReflectStep) for s in plan.steps)

    def test_partial_layer_reflection(self):
        # layers covering only SOME windows still form a valid reflection
        n = 10
        c = Circuit(n)
        for q in range(4, n):
            c.h(q)
        c.phase_flip(513)
        for q in range(4, n):
            c.h(q)
        plan = compile_circuit(c, window=3)
        assert any(isinstance(s, ReflectStep) for s in plan.steps)


class TestReflectExecution:
    @pytest.mark.parametrize("n,window", [(8, 7), (10, 4), (9, 3)])
    def test_planar_matches_window_path(self, n, window):
        c = _h_flip_h(n, oracle=5, flip=0)
        fast = compile_circuit(c, window=window)
        slow = _reflect_free(c, window=window)
        assert any(isinstance(s, ReflectStep) for s in fast.steps)
        assert not any(isinstance(s, ReflectStep) for s in slow.steps)
        got = np.asarray(apply_plan_planar(zero_state_planar(n), fast))
        want = np.asarray(apply_plan_planar(zero_state_planar(n), slow))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_complex_matches_planar(self):
        n = 9
        c = grover_circuit(n, marked=100, iterations=5)
        plan = compile_circuit(c)
        got_c = np.asarray(apply_plan(zero_state(n, jnp.complex128), plan))
        got_p = from_planar(np.asarray(
            apply_plan_planar(zero_state_planar(n), plan)))
        np.testing.assert_allclose(got_p, got_c, atol=1e-4)

    def test_grover_amplifies(self):
        n = 10
        c = grover_circuit(n, marked=666)
        plan = compile_circuit(c)
        assert any(isinstance(s, ReflectStep) for s in plan.steps)
        psi = np.asarray(apply_plan_planar(zero_state_planar(n), plan))
        p = psi[0] ** 2 + psi[1] ** 2
        assert p[666] > 0.99

    def test_density_expands_reflections(self):
        n = 6
        c = _h_flip_h(n, oracle=11)
        plan = compile_circuit(c)
        assert any(isinstance(s, ReflectStep) for s in plan.steps)
        rho0 = np.zeros((2**n, 2**n), complex)
        rho0[0, 0] = 1.0
        got = np.asarray(apply_plan_density(jnp.asarray(rho0), plan))
        psi = from_planar(np.asarray(
            apply_plan_planar(zero_state_planar(n), plan)))
        np.testing.assert_allclose(got, np.outer(psi, psi.conj()), atol=1e-5)
        # planar density path too
        gp = np.asarray(apply_plan_density_planar(zero_density_planar(n),
                                                  plan))
        np.testing.assert_allclose(gp[0] + 1j * gp[1], got, atol=1e-4)
