"""Tier-1 kernel tests: tensor algebra vs dense-matrix oracles.

Mirrors the reference's cross-validation pattern (unitTests.py testPartialTrace):
the general contraction-based algorithms are checked against straightforward
dense constructions on small registers.
"""
import numpy as np
import pytest

from qbot_tpu.ops import core, gates

R2 = 2**-0.5


def dense_embed(n, first, g):
    return np.kron(np.kron(np.eye(2**first), g), np.eye(2 ** (n - first - core.num_qubits(g))))


def rand_density(n, seed=0):
    rng = np.random.default_rng(seed)
    d = 2**n
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = a @ a.conj().T
    return rho / np.trace(rho)


class TestApply:
    def test_single_qubit_matches_dense(self):
        rho = rand_density(3)
        for q in range(3):
            got = core.apply_gate_targets(rho, gates.hadamard(), [q])
            full = dense_embed(3, q, gates.hadamard())
            want = full @ rho @ full.conj().T
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_two_qubit_contiguous(self):
        rho = rand_density(4, seed=1)
        cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                        dtype=complex)
        for first in range(3):
            got = core.apply_gate_targets(rho, cnot, [first, first + 1])
            full = dense_embed(4, first, cnot)
            want = full @ rho @ full.conj().T
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_full_register_signature(self):
        rho = rand_density(2, seed=2)
        g = np.kron(gates.hadamard(), gates.pauli_x())
        np.testing.assert_allclose(core.apply_gate(g, rho),
                                   g @ rho @ g.conj().T, atol=1e-12)

    def test_noncontiguous_targets(self):
        """Gate on qubits [2, 0] == swap-conjugated contiguous application."""
        rho = rand_density(3, seed=3)
        cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                        dtype=complex)
        got = core.apply_gate_targets(rho, cnot, [2, 0])
        # oracle: swap qubits so [2,0] -> [0,1], apply, swap back
        s02 = gates.swap_qubits(3, 0, 2)
        s12 = gates.swap_qubits(3, 1, 2)
        perm = s12 @ s02  # maps qubit2->0, qubit0->1
        full = perm.conj().T @ dense_embed(3, 0, cnot) @ perm
        want = full @ rho @ full.conj().T
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_state_vector_apply(self):
        psi = np.zeros(8, dtype=complex)
        psi[0] = 1
        psi = core.apply_gate_state(psi, gates.hadamard(), [0])
        psi = core.apply_gate_state(
            psi,
            np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                     dtype=complex),
            [0, 1],
        )
        want = np.zeros(8, dtype=complex)
        want[0b000] = R2
        want[0b110] = R2
        np.testing.assert_allclose(psi, want, atol=1e-12)

    def test_controlled_apply(self):
        rho = rand_density(3, seed=4)
        got = core.apply_controlled(rho, gates.pauli_x(), [2], [0])
        full = gates.multi_controlled(3, [0], 2, gates.pauli_x())
        want = full @ rho @ full.conj().T
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestPartialTrace:
    def test_split_contiguous_oracle(self):
        """Arbitrary-subset trace equals the reshape/trace oracle on splits."""
        rho = rand_density(4, seed=5)
        a, b = core.partial_trace_split(rho, [0, 1])
        t = rho.reshape(4, 4, 4, 4)
        np.testing.assert_allclose(a, np.trace(t, axis1=1, axis2=3), atol=1e-12)
        np.testing.assert_allclose(b, np.trace(t, axis1=0, axis2=2), atol=1e-12)

    def test_trace_of_product_state(self):
        plus = R2 * np.array([1, 1], dtype=complex)
        one = np.array([0, 1], dtype=complex)
        rho = np.kron(core.ket_to_density(plus), core.ket_to_density(one))
        a, b = core.partial_trace_split(rho, [1])
        np.testing.assert_allclose(a, core.ket_to_density(one), atol=1e-12)
        np.testing.assert_allclose(b, core.ket_to_density(plus), atol=1e-12)

    def test_entangled_trace_is_mixed(self):
        bell = R2 * np.array([1, 0, 0, 1], dtype=complex)
        rho = core.ket_to_density(bell)
        a = core.partial_trace_keep(rho, [0])
        np.testing.assert_allclose(a, np.eye(2) / 2, atol=1e-12)

    def test_trace_preserves_trace(self):
        rho = rand_density(4, seed=6)
        for keep in ([0], [1, 3], [0, 2, 3]):
            a = core.partial_trace_keep(rho, keep)
            assert abs(np.trace(a) - 1) < 1e-10


class TestReplaceInterweave:
    def test_replace_whole(self):
        rho = rand_density(2, seed=7)
        new = rand_density(2, seed=8)
        np.testing.assert_allclose(core.replace_qubits(rho, new, [0, 1]), new,
                                   atol=1e-12)

    def test_replace_single_on_product(self):
        zero = core.ket_to_density(np.array([1, 0], dtype=complex))
        one = core.ket_to_density(np.array([0, 1], dtype=complex))
        rho = np.kron(zero, zero)
        got = core.replace_qubits(rho, one, [1])
        np.testing.assert_allclose(got, np.kron(zero, one), atol=1e-12)
        got = core.replace_qubits(rho, one, [0])
        np.testing.assert_allclose(got, np.kron(one, zero), atol=1e-12)

    def test_replace_size_mismatch_raises(self):
        rho = rand_density(2, seed=9)
        with pytest.raises(ValueError):
            core.replace_qubits(rho, rand_density(2, seed=10), [0])

    def test_interweave_roundtrip(self):
        """Splitting and re-interleaving reconstructs a product state."""
        a = rand_density(1, seed=11)
        b = rand_density(2, seed=12)
        for positions in ([0], [1], [2]):
            combined = core.interweave(a, b, positions)
            got_a, got_b = core.partial_trace_split(combined, positions)
            np.testing.assert_allclose(got_a, a, atol=1e-12)
            np.testing.assert_allclose(got_b, b, atol=1e-12)


class TestDensityHelpers:
    def test_tensor_product_skips_empty(self):
        e = core.empty_state()
        x = np.eye(2, dtype=complex)
        np.testing.assert_allclose(core.tensor_product(e, x, e), x)
        assert core.tensor_product().size == 0

    def test_tensor_power(self):
        h = gates.hadamard()
        np.testing.assert_allclose(core.tensor_power(h, 2), np.kron(h, h))
        np.testing.assert_allclose(core.tensor_power(h, 0), np.eye(2))

    def test_kets_to_density_mixture(self):
        k0 = np.array([1, 0], dtype=complex)
        k1 = np.array([0, 1], dtype=complex)
        rho = core.kets_to_density([k0, k1], [0.25, 0.75])
        np.testing.assert_allclose(rho, np.diag([0.25, 0.75]), atol=1e-12)

    def test_ket_to_density_conjugates(self):
        ket = R2 * np.array([1, 1j], dtype=complex)
        rho = core.ket_to_density(ket)
        assert abs(np.trace(rho) - 1) < 1e-12
        np.testing.assert_allclose(rho, rho.conj().T, atol=1e-12)

    def test_mix_and_normalize(self):
        a, b = rand_density(2, seed=13), rand_density(2, seed=14)
        mixed = core.mix_densities([0.3, 0.7], [a, b])
        np.testing.assert_allclose(mixed, 0.3 * a + 0.7 * b, atol=1e-12)
        np.testing.assert_allclose(np.trace(core.normalize_density(2.5 * a)), 1,
                                   atol=1e-12)

    def test_density_to_ensemble_reconstructs(self):
        rho = rand_density(2, seed=15)
        pairs = core.density_to_ensemble(rho)
        rebuilt = sum(p * core.ket_to_density(k) for p, k in pairs)
        np.testing.assert_allclose(rebuilt, rho, atol=1e-10)
