"""Lowering: compile .qb programs to circuit IR for the TPU engine.

The BASELINE north star is "the interpreter lowers programs to JAX": this
module runs a .qb program through the normal front-end (expressions, marks,
classical control flow — loops simply unroll) but *records* the unitary
schedule into a :class:`~qbot_tpu.tpu.circuit.Circuit` instead of mutating
a dense host-side density matrix.  The resulting plan executes through the
window-fusion compiler and Pallas executors at any register size the chip
can hold — far beyond the dense front-end's reach.

Lowerable surface: an initial pure-product ``qset``, then ``gate``/``swap``
with concrete (non-ProbVal) operands, classical ops (``cdef``, ``pydo``,
``cout``, ``jump``/``cjmp``/``retr``/``halt`` on classical conditions), and
a final ``meas``/``peek`` in any product basis.  Mixing ops (``disc``,
mid-circuit ``meas``, ProbVal operands) are outside the unitary fragment
and raise a lowering error naming the line.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import qbot_tpu.errors as err
from qbot_tpu.basis import Basis
from qbot_tpu.frontend import operations as ops
from qbot_tpu.frontend.evaluation import evaluate_expr
from qbot_tpu.frontend.interpreter import record_marks, tokenize_line
from qbot_tpu.helpers import int_log2
from qbot_tpu.probval import ProbVal
from qbot_tpu.tpu.circuit import Circuit

__all__ = ["LoweredProgram", "lower_program", "run_lowered"]


class LoweringError(err.QbotScriptError):
    """The program steps outside the unitary fragment."""


@dataclass
class LoweredProgram:
    circuit: Circuit
    initial_kets: list[np.ndarray]          # tensor factors of |ψ₀⟩
    measure_basis: Optional[Basis] = None
    measure_targets: Optional[list[int]] = None
    namespace: dict = field(default_factory=dict)

    @property
    def n(self) -> int:
        return self.circuit.n


def _unsupported(lines, line_num, what):
    return LoweringError(err.format_script_error(
        lines, line_num, "LoweringError",
        f"{what} is outside the unitary fragment - run this program with "
        f"the dense interpreter instead"), line_num, "LoweringError")


def _as_product_kets(lines, line_num, val) -> list[np.ndarray]:
    """Decompose a state-prep operand into 1-or-more pure tensor factors."""
    if isinstance(val, ProbVal):
        raise _unsupported(lines, line_num, "ProbVal state preparation")
    arr = np.asarray(val)
    if arr.ndim == 1:
        return [arr.astype(complex)]
    # density matrix: accept only pure states (rank-1)
    vals, vecs = np.linalg.eigh(arr)
    top = int(np.argmax(vals))
    if not np.isclose(vals[top], np.trace(arr).real, atol=1e-9):
        raise _unsupported(lines, line_num, "mixed-state preparation")
    return [vecs[:, top].astype(complex)]


def lower_program(text: str) -> LoweredProgram:
    lines = text.splitlines()
    ns: dict = {"state": None, "__marks": {}, "__prev_jump": -1}
    record_marks(ns, lines)

    circuit: Optional[Circuit] = None
    initial_kets: list[np.ndarray] = []
    measured: Optional[tuple] = None
    n = 0

    line_num = -1
    while line_num < len(lines) - 1:
        line_num += 1
        tokens = tokenize_line(lines[line_num])
        if not tokens:
            continue
        op_name = tokens[0]
        if op_name in ("note", "mark"):
            continue
        if op_name not in ops.OPERATIONS:
            raise err.unknown_operation(lines, line_num, op_name)
        n_args = len(tokens) - 1
        _, lo, hi = ops.OPERATIONS[op_name]
        if n_args < lo or n_args > hi:
            raise err.num_arguments_error(lines, line_num, op_name, n_args,
                                          lo, hi)
        if measured is not None and op_name in ("qset", "gate", "swap",
                                                "meas", "peek", "disc"):
            raise _unsupported(lines, line_num,
                               "operations after the final measurement")

        if op_name == "qset":
            if circuit is not None:
                raise _unsupported(lines, line_num, "mid-circuit qset")
            val = evaluate_expr(lines, line_num, tokens[1], ns)
            if len(tokens) > 2:
                raise _unsupported(lines, line_num, "targeted qset")
            initial_kets = _as_product_kets(lines, line_num, val)
            n = sum(int_log2(k.shape[0]) for k in initial_kets)
            circuit = Circuit(n)
            continue

        if op_name == "gate":
            if circuit is None:
                raise _unsupported(lines, line_num, "gate before qset")
            g = evaluate_expr(lines, line_num, tokens[1], ns)
            if isinstance(g, ProbVal):
                raise _unsupported(lines, line_num, "ProbVal gate")
            first = 0
            if len(tokens) > 2:
                first = evaluate_expr(lines, line_num, tokens[2], ns)
                if not isinstance(first, (int, np.integer)):
                    raise _unsupported(lines, line_num, "non-int target")
            controls = []
            if len(tokens) > 3:
                controls = ops._ensure_container(
                    lines, line_num,
                    evaluate_expr(lines, line_num, tokens[3], ns))
                if isinstance(controls, ProbVal):
                    raise _unsupported(lines, line_num, "ProbVal controls")
            if len(tokens) > 4:
                cond = evaluate_expr(lines, line_num, tokens[4], ns)
                if isinstance(cond, ProbVal):
                    raise _unsupported(lines, line_num, "ProbVal conditional")
                if not cond:
                    continue
            g = np.asarray(g)
            k = int_log2(g.shape[0])
            targets = list(range(int(first), int(first) + k))
            for q in targets + list(controls):
                if q < 0 or q >= n:
                    raise err.index_error(lines, line_num, "target", q, n - 1)
            circuit.gate(g, targets, list(controls))
            continue

        if op_name == "swap":
            if circuit is None:
                raise _unsupported(lines, line_num, "swap before qset")
            a = evaluate_expr(lines, line_num, tokens[1], ns)
            b = evaluate_expr(lines, line_num, tokens[2], ns)
            if isinstance(a, ProbVal) or isinstance(b, ProbVal):
                raise _unsupported(lines, line_num, "ProbVal swap targets")
            if a != b:
                circuit.swap(int(a), int(b))
            continue

        if op_name in ("meas", "peek"):
            if circuit is None:
                raise _unsupported(lines, line_num, "measurement before qset")
            basis = evaluate_expr(lines, line_num, tokens[2], ns)
            if not isinstance(basis, Basis):
                raise err.type_error(lines, line_num, ["Basis"],
                                     type(basis).__name__)
            targets = list(range(n))
            if len(tokens) > 3:
                targets = ops._ensure_container(
                    lines, line_num,
                    evaluate_expr(lines, line_num, tokens[3], ns))
                if isinstance(targets, ProbVal):
                    raise _unsupported(lines, line_num, "ProbVal targets")
                targets = sorted(set(targets))
            measured = (basis, targets, tokens[1])
            continue

        if op_name == "disc":
            raise _unsupported(lines, line_num, "disc (non-unitary)")

        # classical ops run normally (control flow unrolls)
        op, _, _ = ops.OPERATIONS[op_name]
        result = op(ns, lines, line_num, tokens)
        if result is None:
            continue
        if result.halt:
            break
        if result.jump_line is not None:
            line_num = result.jump_line - 1

    if circuit is None:
        circuit = Circuit(0)
    lp = LoweredProgram(circuit, initial_kets, namespace=ns)
    if measured is not None:
        lp.measure_basis, lp.measure_targets = measured[0], measured[1]
    return lp


def run_lowered(lp: LoweredProgram, window: int = 7, use_planar: bool = True):
    """Execute a lowered program on the device engine.

    Returns (outcome_probs or None, final_state_device_array).
    """
    import jax.numpy as jnp

    from qbot_tpu.tpu.compiler import compile_circuit
    from qbot_tpu.tpu.planar import (
        apply_plan_planar,
        planar_probs,
        to_planar,
    )
    from qbot_tpu.tpu.simulator import apply_plan, computation_probs

    psi0 = np.array([1.0 + 0j])
    for ket in lp.initial_kets:
        psi0 = np.kron(psi0, ket)
    plan = compile_circuit(lp.circuit, window=window)

    if use_planar:
        psi = apply_plan_planar(jnp.asarray(to_planar(psi0)), plan)
        probs_fn = lambda targets: planar_probs(psi, targets, lp.n)
    else:
        psi = apply_plan(jnp.asarray(psi0, dtype=jnp.complex64), plan)
        probs_fn = lambda targets: computation_probs(psi, targets, lp.n)

    if lp.measure_basis is None:
        return None, psi

    basis = lp.measure_basis
    targets = lp.measure_targets
    if basis.numQubits == 1 and all(
            np.allclose(k, e) for k, e in zip(
                basis.kets, np.eye(2, dtype=complex))):
        return np.asarray(probs_fn(targets)), psi

    # general product basis: rotate the measured qubits into the basis frame
    # (B† per block), then read computation probabilities
    kets = np.stack(basis.kets)                      # (b, d)
    rot = kets.conj()                                # ⟨basis_i| rows
    bq = basis.numQubits
    post = Circuit(lp.n)
    for i in range(0, len(targets), bq):
        block = targets[i:i + bq]
        if list(block) != list(range(block[0], block[0] + bq)):
            raise ValueError(
                "multi-qubit basis measurement requires contiguous target "
                "blocks in the lowered path")
        post.gate(rot, block)
    post_plan = compile_circuit(post, window=window)
    if use_planar:
        psi_rot = apply_plan_planar(psi, post_plan)
        return np.asarray(planar_probs(psi_rot, targets, lp.n)), psi
    psi_rot = apply_plan(psi, post_plan)
    return np.asarray(computation_probs(psi_rot, targets, lp.n)), psi
