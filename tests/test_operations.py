"""Mini-program conformance tests: every DSL op via executeTxt.

Mirrors the reference's testOperations tier (unitTests.py:327-811): inline
.qb fixtures executed end-to-end, asserting on the returned namespace.
"""
import numpy as np
import pytest

from qbot_tpu import executeTxt
from qbot_tpu.errors import QbotScriptError
from qbot_tpu.ops import core
from qbot_tpu.ops.measurement import MeasurementResult
from qbot_tpu.probval import ProbVal

R2 = 2**-0.5
ZERO = np.array([1, 0], dtype=complex)
ONE = np.array([0, 1], dtype=complex)
PLUS = R2 * np.array([1, 1], dtype=complex)


def rho(*kets):
    return core.ket_to_density(core.tensor_product(*kets))


class TestDefines:
    def test_cdef(self):
        ns = executeTxt("cdef x ; 1234")
        assert ns["x"] == 1234
        assert ns["__is_q_x"] is False

    def test_cdef_probval(self):
        ns = executeTxt('cdef y ; ProbVal([0.25, 0.75], ["hello", "there"])')
        assert ns["y"].is_equivalent(ProbVal([0.25, 0.75], ["hello", "there"]))

    def test_qdef_ket_coerced_to_density(self):
        ns = executeTxt("qdef x ; np_array([1, 0], dtype=np_complex128)")
        np.testing.assert_allclose(ns["x"], rho(ZERO), atol=1e-12)
        assert ns["__is_q_x"] is True

    def test_qdef_probval_mixed(self):
        ns = executeTxt("qdef y ; ProbVal([0.25, 0.75], [comp[0], comp[1]])")
        np.testing.assert_allclose(ns["y"], np.diag([0.25, 0.75]), atol=1e-12)

    def test_cdef_invalid_name(self):
        with pytest.raises(QbotScriptError):
            executeTxt("cdef 2x ; 1")


class TestQset:
    def test_whole_register(self):
        ns = executeTxt("qset comp[0]")
        np.testing.assert_allclose(ns["state"], rho(ZERO))

    def test_int_target(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0])\n"
            "qset comp[1] ; 1")
        np.testing.assert_allclose(ns["state"], rho(ZERO, ONE), atol=1e-12)

    def test_list_targets(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0], comp[0])\n"
            "qset tensorProd(comp[1], comp[1]) ; [0, 2]")
        np.testing.assert_allclose(ns["state"], rho(ONE, ZERO, ONE), atol=1e-12)

    def test_probval_targets_mix(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0])\n"
            "qset comp[1] ; ProbVal([0.5, 0.5], [0, 1])")
        want = 0.5 * rho(ONE, ZERO) + 0.5 * rho(ZERO, ONE)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_ket_auto_converted(self):
        # reference defect fixed: bare kets convert (operators.py:70-72)
        ns = executeTxt("qset np_array([0, 1], dtype=np_complex128)")
        np.testing.assert_allclose(ns["state"], rho(ONE), atol=1e-12)

    def test_target_out_of_range(self):
        with pytest.raises(QbotScriptError):
            executeTxt("qset comp[0]\nqset comp[1] ; 5")


class TestGate:
    def test_simple(self):
        ns = executeTxt("qset comp[0]\ngate hadamardGate")
        np.testing.assert_allclose(ns["state"], rho(PLUS), atol=1e-12)

    def test_target(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0])\n"
            "gate pauliXGate ; 1")
        np.testing.assert_allclose(ns["state"], rho(ZERO, ONE), atol=1e-12)

    def test_controlled(self):
        ns = executeTxt(
            "qset tensorProd(comp[1], comp[0])\n"
            "gate pauliXGate ; 1 ; 0")
        np.testing.assert_allclose(ns["state"], rho(ONE, ONE), atol=1e-12)

    def test_control_not_fired(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0])\n"
            "gate pauliXGate ; 1 ; 0")
        np.testing.assert_allclose(ns["state"], rho(ZERO, ZERO), atol=1e-12)

    def test_multi_controlled(self):
        ns = executeTxt(
            "qset tensorProd(comp[1], comp[1], comp[0])\n"
            "gate pauliXGate ; 2 ; [0, 1]")
        np.testing.assert_allclose(ns["state"], rho(ONE, ONE, ONE), atol=1e-12)

    def test_conditional_false(self):
        ns = executeTxt("qset comp[0]\ngate pauliXGate ; 0 ; [] ; 1 > 2")
        np.testing.assert_allclose(ns["state"], rho(ZERO), atol=1e-12)

    def test_conditional_probval(self):
        ns = executeTxt(
            "qset comp[0]\n"
            "gate pauliXGate ; 0 ; [] ; ProbVal([0.25, 0.75], [True, False])")
        want = 0.25 * rho(ONE) + 0.75 * rho(ZERO)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_probval_gate(self):
        ns = executeTxt(
            "qset comp[0]\n"
            "gate ProbVal([0.5, 0.5], [pauliXGate, identityGate])")
        want = 0.5 * rho(ONE) + 0.5 * rho(ZERO)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_probval_target(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[0])\n"
            "gate pauliXGate ; ProbVal([0.5, 0.5], [0, 1])")
        want = 0.5 * rho(ONE, ZERO) + 0.5 * rho(ZERO, ONE)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_probval_controls(self):
        ns = executeTxt(
            "qset tensorProd(comp[1], comp[0], comp[0])\n"
            "gate pauliXGate ; 2 ; ProbVal([0.5, 0.5], [0, 1])")
        want = 0.5 * rho(ONE, ZERO, ONE) + 0.5 * rho(ONE, ZERO, ZERO)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_control_target_overlap_raises(self):
        with pytest.raises(QbotScriptError):
            executeTxt("qset tensorProd(comp[0], comp[0])\ngate pauliXGate ; 0 ; 0")

    def test_multi_qubit_gate_contiguous_from_first_target(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[1], comp[0])\n"
            "gate swapGate(2, 0, 1) ; 1")
        np.testing.assert_allclose(ns["state"], rho(ZERO, ZERO, ONE), atol=1e-12)


class TestDiscSwap:
    def test_disc_int(self):
        ns = executeTxt("qset tensorProd(comp[0], comp[1])\ndisc 0")
        np.testing.assert_allclose(ns["state"], rho(ONE), atol=1e-12)

    def test_disc_list(self):
        ns = executeTxt("qset tensorProd(comp[0], comp[1], comp[0])\ndisc [0, 2]")
        np.testing.assert_allclose(ns["state"], rho(ONE), atol=1e-12)

    def test_disc_probval(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[1])\n"
            "disc ProbVal([0.5, 0.5], [0, 1])")
        want = 0.5 * rho(ONE) + 0.5 * rho(ZERO)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_swap(self):
        ns = executeTxt("qset tensorProd(comp[0], comp[1])\nswap 0 ; 1")
        np.testing.assert_allclose(ns["state"], rho(ONE, ZERO), atol=1e-12)

    def test_swap_probval(self):
        ns = executeTxt(
            "qset tensorProd(comp[0], comp[1], comp[0])\n"
            "swap 1 ; ProbVal([0.5, 0.5], [0, 2])")
        want = 0.5 * rho(ONE, ZERO, ZERO) + 0.5 * rho(ZERO, ZERO, ONE)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_probval_operand_not_mutated_across_ops(self):
        # a ProbVal<int> reused as the targets of two ops must keep its
        # original scalar branches: operand coercion wraps branches in a
        # COPY, never in the user's object
        ns = executeTxt(
            "cdef t ; ProbVal([0.5, 0.5], [0, 1])\n"
            "qset tensorProd(comp[0], comp[1])\n"
            "disc t\n"
            "qset tensorProd(comp[0], comp[1])\n"
            "disc t")
        assert ns["t"].values == [0, 1]
        want = 0.5 * rho(ONE) + 0.5 * rho(ZERO)
        np.testing.assert_allclose(ns["state"], want, atol=1e-12)

    def test_swap_same_qubit_noop(self):
        ns = executeTxt("qset tensorProd(comp[0], comp[1])\nswap 1 ; 1")
        np.testing.assert_allclose(ns["state"], rho(ZERO, ONE), atol=1e-12)


class TestMeasPeek:
    def test_meas_binds_result_and_collapses(self):
        ns = executeTxt("qset hada[0]\nmeas x ; computation")
        assert isinstance(ns["x"], MeasurementResult)
        np.testing.assert_allclose(ns["x"].probs, [0.5, 0.5], atol=1e-12)
        np.testing.assert_allclose(ns["state"], np.eye(2) / 2, atol=1e-12)

    def test_meas_targets(self):
        ns = executeTxt(
            "qset tensorProd(comp[1], hada[0])\n"
            "meas x ; comp ; 0")
        np.testing.assert_allclose(ns["x"].probs, [0.0, 1.0], atol=1e-12)

    def test_meas_tuple_and_set_targets(self):
        for t in ("(0, 1)", "{0, 1}"):
            ns = executeTxt(
                f"qset tensorProd(comp[1], comp[0])\nmeas x ; comp ; {t}")
            np.testing.assert_allclose(ns["x"].probs, [0, 0, 1, 0], atol=1e-12)

    def test_meas_probval_targets(self):
        # reference defect fixed: ProbVal-targeted meas works (SURVEY §2.3.3)
        ns = executeTxt(
            "qset tensorProd(comp[1], comp[0])\n"
            "meas x ; comp ; ProbVal([0.5, 0.5], [0, 1])")
        np.testing.assert_allclose(ns["x"].probs, [0.5, 0.5], atol=1e-12)

    def test_peek_leaves_state(self):
        ns = executeTxt("qset hada[0]\npeek x ; computation")
        np.testing.assert_allclose(ns["state"], rho(PLUS), atol=1e-12)
        np.testing.assert_allclose(ns["x"].probs, [0.5, 0.5], atol=1e-12)

    def test_meas_bell_basis(self):
        ns = executeTxt("qset bell[1]\nmeas x ; bell")
        np.testing.assert_allclose(ns["x"].probs, [0, 1, 0, 0], atol=1e-12)

    def test_meas_requires_basis(self):
        with pytest.raises(QbotScriptError):
            executeTxt("qset comp[0]\nmeas x ; 42")


class TestControlFlow:
    def test_halt(self):
        ns = executeTxt("cdef x ; 1\nhalt\ncdef x ; 2")
        assert ns["x"] == 1

    def test_halt_conditional(self):
        ns = executeTxt("cdef x ; 1\nhalt x == 2\ncdef x ; 2\nhalt x == 2\ncdef x ; 3")
        assert ns["x"] == 2

    def test_jump_and_mark(self):
        ns = executeTxt("jump skip\ncdef x ; 1\nmark skip\ncdef y ; 2")
        assert "x" not in ns
        assert ns["y"] == 2

    def test_computed_jump(self):
        ns = executeTxt('jump "sk" + "ip"\ncdef x ; 1\nmark skip\ncdef y ; 2')
        assert "x" not in ns and ns["y"] == 2

    def test_cjmp_loop(self):
        ns = executeTxt(
            "cdef i ; 0\n"
            "mark loop\n"
            "cdef i ; i + 1\n"
            "cjmp loop ; i < 5")
        assert ns["i"] == 5

    def test_cjmp_probval_condition_rejected(self):
        with pytest.raises(QbotScriptError):
            executeTxt(
                "mark m\n"
                "cjmp m ; ProbVal([0.5, 0.5], [True, False])")

    def test_retr(self):
        ns = executeTxt(
            "cdef r ; []\n"
            "jump sub\n"
            "pydo r.append(2)\n"
            "halt\n"
            "mark sub\n"
            "pydo r.append(1)\n"
            "retr")
        assert ns["r"] == [1, 2]

    def test_retr_conditional_false_continues(self):
        ns = executeTxt(
            "cdef r ; []\n"
            "jump sub\n"
            "pydo r.append(2)\n"
            "halt\n"
            "mark sub\n"
            "pydo r.append(1)\n"
            "retr False\n"
            "pydo r.append(3)")
        assert ns["r"] == [1, 3]

    def test_retr_no_prior_jump_restarts(self):
        # __prev_jump initialised to -1: retr with no prior jump restarts at
        # line 0 (the __marks dict persists across the restart, so it can
        # count passes without builtins)
        ns = executeTxt(
            "pydo __marks.update(n = __marks.get('n', -1) + 1)\n"
            "halt __marks['n'] == 2\n"
            "retr")
        assert ns["__marks"]["n"] == 2

    def test_unknown_mark_raises(self):
        with pytest.raises(QbotScriptError):
            executeTxt("jump nowhere")


class TestMisc:
    def test_pydo_side_effect(self):
        ns = executeTxt('cdef x ; ["hello"]\npydo x.append("there")')
        assert ns["x"] == ["hello", "there"]

    def test_cout(self, capsys):
        executeTxt('cout "hello world!"')
        assert capsys.readouterr().out == "hello world!\n"

    def test_cout_measurement_readout(self, capsys):
        executeTxt("qset computation[0]\nmeas x ; computation\ncout x")
        out = capsys.readouterr().out
        assert out == "|0〉- 1.0 (100.0%)\n|1〉- 0.0 (0.0%)\n\n"

    def test_note_skipped(self):
        ns = executeTxt("note this; is; not; parsed\ncdef x ; 1")
        assert ns["x"] == 1

    def test_opcode_is_first_four_chars(self):
        # observable tokenizer quirk: 'coutx' parses as 'cout x'
        ns = executeTxt("cdef x ; 5\ncoutx")
        assert ns["x"] == 5

    def test_unknown_op_raises(self):
        with pytest.raises(QbotScriptError):
            executeTxt("bogus thing")

    def test_arity_checked(self):
        with pytest.raises(QbotScriptError):
            executeTxt("cdef x")

    def test_namespace_bookkeeping(self):
        ns = executeTxt("cdef x ; 1\nqset comp[0]")
        assert ns["__is_q_state"] is True
        assert ns["__updated_state"] is True
        assert ns["__is_q_x"] is False
