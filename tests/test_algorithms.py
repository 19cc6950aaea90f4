"""Golden end-to-end tests: the README example algorithms.

The conformance suite (SURVEY §4 testAlgorithms tier): the reference
README's example programs are executable specs; their outputs are asserted
bit-for-bit (reference README.md:466-535).
"""
import numpy as np

from qbot_tpu import executeTxt

SUPERDENSE = """
cdef results ; []
cdef index ; 0

mark loop
qset bell[0]
gate pauliXGate ; 0 ; [] ; (index & 0b01) != 0
gate pauliZGate ; 0 ; [] ; (index & 0b10) != 0
meas result ; bell
pydo results.append(result.probs)
cdef index ; index + 1
cjmp loop ; index < 4
"""

PHASE_KICKBACK = """
cdef results ; []

note eiganValue is 1
qset tensorProd(comp[0], hada[0])
jump checkPhase

note eiganValue is -1
qset tensorProd(comp[0], hada[1])
jump checkPhase

halt

mark checkPhase
gate hadamardGate ; 0
gate pauliXGate   ; 1 ; 0
gate hadamardGate ; 0
meas tmp ; comp ; 0
pydo results.append(1 if np_isclose(tmp.probs[0], 1.0) else -1)
retr
"""

DEUTSCH = """
cdef results ; []

note constant f (should return |0>)
cdef f ; lambda x: 1
jump check

note balanced f (should return |1>)
cdef f ; lambda x: x
jump check

halt

mark check
qset tensorProd(comp[0], hada[1])
gate hadamardGate ; 0
gate simonsGate(2, f)
gate hadamardGate ; 0
meas tmp ; comp ; 0
pydo results.append("constant" if np_isclose(tmp.probs[0], 1.0) else "balanced")
retr
"""


def test_superdense_coding_outcome_matrix_is_identity():
    ns = executeTxt(SUPERDENSE)
    np.testing.assert_allclose(np.array(ns["results"]), np.eye(4), atol=1e-12)


def test_phase_kickback_eigenvalues():
    ns = executeTxt(PHASE_KICKBACK)
    assert ns["results"] == [1, -1]


def test_deutsch_constant_and_balanced():
    ns = executeTxt(DEUTSCH)
    assert ns["results"] == ["constant", "balanced"]


def test_grover_two_qubit():
    """2-qubit Grover: one iteration finds the marked state |11⟩ exactly."""
    src = """
qset tensorProd(comp[0], comp[0])
gate hadamardGate ; 0
gate hadamardGate ; 1
note oracle marks |11> via controlled-Z
gate pauliZGate ; 1 ; 0
note diffusion
gate hadamardGate ; 0
gate hadamardGate ; 1
gate pauliXGate ; 0
gate pauliXGate ; 1
gate pauliZGate ; 1 ; 0
gate pauliXGate ; 0
gate pauliXGate ; 1
gate hadamardGate ; 0
gate hadamardGate ; 1
meas out ; comp
"""
    ns = executeTxt(src)
    np.testing.assert_allclose(ns["out"].probs, [0, 0, 0, 1], atol=1e-10)


def test_qft_inverse_roundtrip():
    src = """
qset tensorProd(comp[1], comp[0], comp[1])
gate qftGate(3)
gate np_conj(qftGate(3)).T
meas out ; comp
"""
    ns = executeTxt(src)
    want = [0.0] * 8
    want[0b101] = 1.0
    np.testing.assert_allclose(ns["out"].probs, want, atol=1e-10)


def test_teleportation():
    """Teleport an arbitrary single-qubit state using deferred corrections."""
    src = """
note prepare payload in a known non-trivial state on qubit 0
qset tensorProd(comp[0], bell[0])
gate yRotGate(0.7) ; 0
note bell measurement circuit on qubits 0,1
gate pauliXGate ; 1 ; 0
gate hadamardGate ; 0
note deferred corrections: CX(1->2), CZ(0->2)
gate pauliXGate ; 2 ; 1
gate pauliZGate ; 2 ; 0
disc [0, 1]
"""
    ns = executeTxt(src)
    from qbot_tpu.ops import core, gates
    want = core.apply_gate_targets(
        core.ket_to_density(np.array([1, 0], dtype=complex)),
        np.asarray(gates.rot_y(0.7)), [0])
    np.testing.assert_allclose(ns["state"], want, atol=1e-10)
