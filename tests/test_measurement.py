"""Measurement engine tests: closed-form quantum-mechanics expectations.

Mirrors the reference's testMeasurment tier (unitTests.py:249-324).
"""
import numpy as np
import pytest

from qbot_tpu.basis import bell, computation, hadamard
from qbot_tpu.ops import core
from qbot_tpu.ops.measurement import (
    MeasurementIndexError,
    MeasurementResult,
    measure,
    outcome_projectors,
    tensor_permute,
)
from qbot_tpu.probval import ProbVal

R2 = 2**-0.5


def ket(*bits):
    v = np.array([1], dtype=complex)
    for b in bits:
        v = np.kron(v, computation.kets[b])
    return v


class TestPermute:
    def test_tensor_permute_readme_example(self):
        got = tensor_permute(3, 2, computation)
        want = core.tensor_product(computation[0], computation[1], computation[0])
        np.testing.assert_allclose(got, want)

    def test_outcome_projectors_matches_tensor_permute(self):
        P = outcome_projectors(computation, 2)
        for i in range(4):
            np.testing.assert_allclose(P[i], tensor_permute(2, i, computation))

    def test_outcome_projectors_bell(self):
        P = outcome_projectors(bell, 1)
        assert P.shape == (4, 4, 4)
        np.testing.assert_allclose(P[2], bell[2])


class TestMeasure:
    def test_zero_in_computation(self):
        rho = core.ket_to_density(ket(0))
        r = measure(rho, computation)
        np.testing.assert_allclose(r.probs, [1.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(r.newState, rho, atol=1e-12)

    def test_plus_in_computation(self):
        rho = core.ket_to_density(hadamard.kets[0])
        r = measure(rho, computation)
        np.testing.assert_allclose(r.probs, [0.5, 0.5], atol=1e-12)
        np.testing.assert_allclose(r.newState, np.eye(2) / 2, atol=1e-12)

    def test_plus_in_hadamard(self):
        rho = core.ket_to_density(hadamard.kets[0])
        r = measure(rho, hadamard)
        np.testing.assert_allclose(r.probs, [1.0, 0.0], atol=1e-12)

    def test_bell_state_in_bell_basis(self):
        for i in range(4):
            rho = core.ket_to_density(bell.kets[i])
            r = measure(rho, bell)
            want = [0.0] * 4
            want[i] = 1.0
            np.testing.assert_allclose(r.probs, want, atol=1e-12)

    def test_bell_state_in_computation(self):
        rho = core.ket_to_density(bell.kets[0])
        r = measure(rho, computation)
        np.testing.assert_allclose(r.probs, [0.5, 0, 0, 0.5], atol=1e-12)

    def test_subset_measurement(self):
        # |0+⟩: measuring qubit 1 in computation gives 50/50 and leaves
        # qubit 0 in |0⟩
        psi = np.kron(ket(0), hadamard.kets[0])
        rho = core.ket_to_density(psi)
        r = measure(rho, computation, [1])
        np.testing.assert_allclose(r.probs, [0.5, 0.5], atol=1e-12)
        want = np.kron(core.ket_to_density(ket(0)), np.eye(2) / 2)
        np.testing.assert_allclose(r.newState, want, atol=1e-12)

    def test_subset_measurement_entangled_collapse(self):
        rho = core.ket_to_density(bell.kets[0])
        r = measure(rho, computation, [0])
        np.testing.assert_allclose(r.probs, [0.5, 0.5], atol=1e-12)
        # post-state: measured qubit mixture ⊗ traced remainder (the
        # reference's collapse model: mixture re-interleaved with the
        # *unmeasured reduced* subsystem, measurement.py:160-164)
        np.testing.assert_allclose(r.newState, np.eye(4) / 4, atol=1e-12)

    def test_peek_does_not_return_state(self):
        rho = core.ket_to_density(ket(0))
        r = measure(rho, computation, collapse=False)
        assert r.newState is None

    def test_set_and_tuple_targets(self):
        rho = core.ket_to_density(core.tensor_product(
            ket(0), hadamard.kets[0], ket(1)))
        for targets in ([0, 2], (0, 2), {0, 2}):
            r = measure(rho, computation, targets)
            np.testing.assert_allclose(r.probs, [0, 1, 0, 0], atol=1e-12)

    def test_symbols(self):
        rho = core.ket_to_density(ket(0, 0))
        r = measure(rho, computation)
        assert r.basisSymbols == ["|0〉|0〉", "|0〉|1〉", "|1〉|0〉", "|1〉|1〉"]

    def test_repr_format(self):
        rho = core.ket_to_density(ket(0))
        r = measure(rho, computation)
        assert repr(r) == "|0〉- 1.0 (100.0%)\n|1〉- 0.0 (0.0%)\n"

    def test_out_of_range_raises(self):
        rho = core.ket_to_density(ket(0))
        with pytest.raises(MeasurementIndexError):
            measure(rho, computation, [5])

    def test_basis_size_mismatch_raises(self):
        rho = core.ket_to_density(ket(0))
        with pytest.raises(ValueError):
            measure(rho, bell, [0])

    def test_getitem(self):
        rho = core.ket_to_density(ket(0))
        r = measure(rho, computation)
        assert r[0] == 1.0


class TestFromProbVal:
    def test_merges_outcome_probs(self):
        r0 = measure(core.ket_to_density(ket(0)), computation)
        r1 = measure(core.ket_to_density(ket(1)), computation)
        pv = ProbVal([0.25, 0.75], [r0, r1])
        merged = MeasurementResult.from_probval(pv)
        np.testing.assert_allclose(merged.probs, [0.25, 0.75], atol=1e-12)
        np.testing.assert_allclose(merged.newState, np.diag([0.25, 0.75]),
                                   atol=1e-12)

    def test_peek_branches_have_no_state(self):
        r0 = measure(core.ket_to_density(ket(0)), computation, collapse=False)
        r1 = measure(core.ket_to_density(ket(1)), computation, collapse=False)
        merged = MeasurementResult.from_probval(ProbVal([0.5, 0.5], [r0, r1]))
        assert merged.newState is None
        np.testing.assert_allclose(merged.probs, [0.5, 0.5], atol=1e-12)
