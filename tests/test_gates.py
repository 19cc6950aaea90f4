"""Tier-1 gate-constructor tests: algebraic identities and literal matrices.

Mirrors the reference test strategy (unitTests.py testGates/testSpecialGates):
generated matrices compared against hand-written literals and identities.
"""
import numpy as np
import pytest

from qbot_tpu.ops import core, gates

R2 = 2**-0.5

CNOT = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                dtype=complex)
TOFFOLI = np.eye(8, dtype=complex)
TOFFOLI[[6, 7], [6, 7]] = 0
TOFFOLI[6, 7] = TOFFOLI[7, 6] = 1


class TestPermutationGates:
    def test_swap_is_involution(self):
        for n in (2, 3, 4):
            for q1 in range(n):
                for q2 in range(n):
                    s = gates.swap_qubits(n, q1, q2)
                    np.testing.assert_allclose(s @ s, np.eye(2**n), atol=1e-12)

    def test_swap_literal_2q(self):
        want = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                        dtype=complex)
        np.testing.assert_allclose(gates.swap_qubits(2, 0, 1), want)

    def test_swap_action_on_basis_states(self):
        # |01⟩ -> |10⟩ under swap(0,1) in a 3-qubit register: |010⟩ -> |100⟩
        s = gates.swap_qubits(3, 0, 1)
        v = np.zeros(8)
        v[0b010] = 1
        assert np.argmax(s @ v) == 0b100

    def test_shift_up_down_are_inverses(self):
        for n in (2, 3, 4):
            for k in (1, 2):
                up = gates.shift_gate(n, True, k)
                down = gates.shift_gate(n, False, k)
                np.testing.assert_allclose(up @ down, np.eye(2**n), atol=1e-12)

    def test_shift_matches_swap_decomposition(self):
        # shifting a 3-qubit register up == swap(0,1) then swap(1,2)
        up = gates.shift_gate(3, True)
        dec = gates.swap_qubits(3, 1, 2) @ gates.swap_qubits(3, 0, 1)
        np.testing.assert_allclose(up, dec, atol=1e-12)

    def test_permutation_gate_from_map(self):
        g = gates.permutation_gate(4, lambda s: (s + 1) % 4)
        v = np.zeros(4)
        v[0] = 1
        assert np.argmax(g @ v) == 1


class TestControlled:
    def test_cnot_literal(self):
        got = gates.multi_controlled(2, [0], 1, gates.pauli_x())
        np.testing.assert_allclose(got, CNOT, atol=1e-12)

    def test_reversed_cnot(self):
        got = gates.multi_controlled(2, [1], 0, gates.pauli_x())
        want = np.array([[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]],
                        dtype=complex)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_cnot_in_hadamard_frame_is_reversed_cnot(self):
        h2 = np.kron(gates.hadamard(), gates.hadamard())
        conj = h2 @ CNOT @ h2
        want = gates.multi_controlled(2, [1], 0, gates.pauli_x())
        np.testing.assert_allclose(conj, want, atol=1e-12)

    def test_toffoli(self):
        got = gates.multi_controlled(3, [0, 1], 2, gates.pauli_x())
        np.testing.assert_allclose(got, TOFFOLI, atol=1e-12)

    def test_toffoli_nested_construction(self):
        nested = gates.multi_controlled(3, [0], 1, CNOT[:, :])
        # controlled-CNOT == Toffoli up to the controlled() block layout
        np.testing.assert_allclose(nested, TOFFOLI, atol=1e-12)

    def test_control_anywhere(self):
        # control on middle qubit, target on last, 3-qubit register
        got = gates.multi_controlled(3, [1], 2, gates.pauli_x())
        want = np.kron(np.eye(2), CNOT)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_overlap_raises(self):
        with pytest.raises(ValueError):
            gates.multi_controlled(2, [0], 0, gates.pauli_x())

    def test_controlled_block_layout(self):
        cg = gates.controlled(gates.pauli_z(), 1)
        np.testing.assert_allclose(cg, np.diag([1, 1, 1, -1]), atol=1e-12)


class TestSpecialGates:
    def test_qft_1_is_hadamard(self):
        np.testing.assert_allclose(gates.qft(1), gates.hadamard(), atol=1e-12)

    def test_qft_2_literal(self):
        w = 1j
        want = 0.5 * np.array(
            [[1, 1, 1, 1], [1, w, -1, -w], [1, -1, 1, -1], [1, -w, -1, w]],
            dtype=complex)
        np.testing.assert_allclose(gates.qft(2), want, atol=1e-12)

    def test_qft_unitary(self):
        for n in (1, 2, 3):
            q = gates.qft(n)
            np.testing.assert_allclose(q @ q.conj().T, np.eye(2**n), atol=1e-12)

    def test_rotations_at_pi(self):
        np.testing.assert_allclose(gates.rot_x(np.pi), -1j * gates.pauli_x(),
                                   atol=1e-12)
        np.testing.assert_allclose(gates.rot_y(np.pi), -1j * gates.pauli_y(),
                                   atol=1e-12)
        np.testing.assert_allclose(gates.rot_z(np.pi), -1j * gates.pauli_z(),
                                   atol=1e-12)

    def test_rotations_unitary(self):
        for make in (gates.rot_x, gates.rot_y, gates.rot_z, gates.phase):
            g = make(0.731)
            np.testing.assert_allclose(g @ g.conj().T, np.eye(2), atol=1e-12)

    def test_simons_oracle_identity_function(self):
        # f(x) = 0 → identity
        g = gates.simons_oracle(2, lambda x: 0)
        np.testing.assert_allclose(g, np.eye(4), atol=1e-12)

    def test_simons_oracle_constant_one(self):
        # f(x) = 1 → flips the ancilla for every x
        g = gates.simons_oracle(2, lambda x: 1)
        np.testing.assert_allclose(g, np.kron(np.eye(2), gates.pauli_x()),
                                   atol=1e-12)

    def test_simons_oracle_balanced(self):
        # f(x) = x on 1 input qubit → CNOT
        g = gates.simons_oracle(2, lambda x: x)
        np.testing.assert_allclose(g, CNOT, atol=1e-12)

    def test_simons_oracle_unitary(self):
        g = gates.simons_oracle(3, lambda x: x % 2)
        np.testing.assert_allclose(g @ g.conj().T, np.eye(8), atol=1e-12)

    def test_embed_matches_kron(self):
        h = gates.hadamard()
        np.testing.assert_allclose(gates.embed(3, 1, h),
                                   np.kron(np.kron(np.eye(2), h), np.eye(2)))

    def test_embed_out_of_range_raises(self):
        with pytest.raises(IndexError):
            gates.embed(2, 1, CNOT)

    def test_check_gate(self):
        assert gates.check_gate(CNOT) == 4
        with pytest.raises(ValueError):
            gates.check_gate(np.eye(3))
