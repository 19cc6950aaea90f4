"""Probabilistic control-flow (ensemble runner) tests.

The capability the reference designed but shipped disabled (its ProbVal
cjmp/halt branching, reference interpreter.py:148-215): ProbVal<bool>
conditions fork the interpreter into weighted branches that merge at
program end.
"""
import numpy as np
import pytest

from qbot_tpu.frontend.ensemble import (
    execute_lines_ensemble,
    executeTxtEnsemble,
)
from qbot_tpu.ops.core import ket_to_density
from qbot_tpu.probval import ProbVal

ZERO = np.array([1, 0], dtype=complex)
ONE = np.array([0, 1], dtype=complex)


class TestDeterministicParity:
    def test_plain_program_unchanged(self):
        ns = executeTxtEnsemble("cdef x ; 1\ncdef y ; x + 1")
        assert ns["y"] == 2

    def test_plain_control_flow(self):
        ns = executeTxtEnsemble(
            "cdef i ; 0\nmark l\ncdef i ; i + 1\ncjmp l ; i < 5")
        assert ns["i"] == 5

    def test_plain_halt_and_retr(self):
        ns = executeTxtEnsemble(
            "cdef r ; []\njump sub\npydo r.append(2)\nhalt\n"
            "mark sub\npydo r.append(1)\nretr")
        assert ns["r"] == [1, 2]


class TestProbabilisticBranching:
    def test_probval_halt_splits(self):
        ns = executeTxtEnsemble(
            "cdef x ; 1\n"
            "halt ProbVal([0.25, 0.75], [True, False])\n"
            "cdef x ; 2")
        assert isinstance(ns["x"], ProbVal)
        assert ns["x"].is_equivalent(ProbVal([0.25, 0.75], [1, 2]))

    def test_probval_cjmp_splits(self):
        ns = executeTxtEnsemble(
            "cjmp skip ; ProbVal([0.5, 0.5], [True, False])\n"
            "cdef x ; 'fell'\n"
            "halt\n"
            "mark skip\n"
            "cdef x ; 'jumped'")
        # fall-through branch halts with x='fell'; jump branch sets 'jumped'
        assert ns["x"].is_equivalent(ProbVal([0.5, 0.5], ["jumped", "fell"]))

    def test_branches_merge_quantum_state(self):
        ns = executeTxtEnsemble(
            "qset comp[0]\n"
            "cjmp flip ; ProbVal([0.25, 0.75], [True, False])\n"
            "halt\n"
            "mark flip\n"
            "gate pauliXGate")
        want = 0.25 * ket_to_density(ONE) + 0.75 * ket_to_density(ZERO)
        np.testing.assert_allclose(np.asarray(ns["state"]), want, atol=1e-12)

    def test_identical_branches_collapse(self):
        ns = executeTxtEnsemble(
            "cjmp same ; ProbVal([0.5, 0.5], [True, False])\n"
            "mark same\n"
            "cdef x ; 42")
        assert ns["x"] == 42

    def test_missing_key_becomes_none_branch(self):
        ns = executeTxtEnsemble(
            "halt ProbVal([0.5, 0.5], [True, False])\n"
            "cdef only_continue ; 7")
        assert ns["only_continue"].is_equivalent(
            ProbVal([0.5, 0.5], [None, 7]))

    def test_nested_splits(self):
        ns = executeTxtEnsemble(
            "cdef x ; 0\n"
            "halt ProbVal([0.5, 0.5], [True, False])\n"
            "cdef x ; 1\n"
            "halt ProbVal([0.5, 0.5], [True, False])\n"
            "cdef x ; 2")
        assert ns["x"].is_equivalent(ProbVal([0.5, 0.25, 0.25], [0, 1, 2]))

    def test_branch_structure_exposed(self):
        res = execute_lines_ensemble(
            "halt ProbVal([0.25, 0.75], [True, False])\ncdef z ; 1"
            .splitlines())
        assert len(res.branch_probs) == 2
        assert sum(res.branch_probs) == pytest.approx(1.0)

    def test_particle_cap_guard(self):
        src = ("cdef i ; 0\n"
               "mark l\n"
               "cdef i ; i + 1\n"
               "halt ProbVal([0.5, 0.5], [True, False])\n"
               "cjmp l ; i < 50")
        with pytest.raises(RuntimeError):
            executeTxtEnsemble(src, max_particles=8)

    def test_probval_retr_splits(self):
        ns = executeTxtEnsemble(
            "cdef r ; []\n"
            "jump sub\n"
            "pydo r.append('after')\n"
            "halt\n"
            "mark sub\n"
            "pydo r.append('sub')\n"
            "retr ProbVal([0.5, 0.5], [True, False])\n"
            "pydo r.append('tail')")
        vals = ns["r"]
        assert isinstance(vals, ProbVal)
        lists = sorted(map(tuple, vals.values))
        assert lists == [("sub", "after"), ("sub", "tail")]

    def test_diverging_register_sizes_stay_branch_valued(self):
        ns = executeTxtEnsemble(
            "qset tensorProd(comp[0], comp[0])\n"
            "halt ProbVal([0.5, 0.5], [True, False])\n"
            "disc 0")
        assert isinstance(ns["state"], ProbVal)
