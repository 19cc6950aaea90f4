"""Differential conformance: run identical programs through the live
reference interpreter (if present at /root/reference) and this framework,
and compare final states and outcome distributions.

This is the strongest possible conformance evidence for the observable
contract (SURVEY §3.5): both interpreters return a namespace whose ``state``
is the final density matrix.  Skipped when the reference tree is absent.
No reference code is vendored — it is imported in place at test time.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "qbot")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def ref_execute():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from qbot.interpreter import executeTxt as ref_executeTxt
        yield ref_executeTxt
    finally:
        sys.path.remove(REFERENCE_PATH)


from qbot_tpu import executeTxt  # noqa: E402

PROGRAMS = [
    # state prep + gates
    "qset tensorProd(comp[0], hada[1])\ngate hadamardGate ; 0",
    "qset tensorProd(comp[1], comp[0])\ngate pauliXGate ; 1 ; 0",
    "qset tensorProd(comp[1], comp[1], comp[0])\ngate pauliXGate ; 2 ; [0, 1]",
    "qset bell[2]\ngate pauliYGate ; 1",
    "qset tensorProd(comp[0], comp[0], comp[1])\ngate qftGate(3)",
    "qset tensorProd(comp[0], comp[1])\ngate swapGate(2, 0, 1)",
    "qset tensorProd(comp[0], comp[1], comp[0])\ngate shiftGate(3)",
    "qset tensorProd(comp[0], comp[1], comp[0])\ngate shiftGate(3, False)",
    # rotations
    "qset comp[0]\ngate xRotGate(1.1)",
    "qset comp[0]\ngate yRotGate(0.4)\ngate zRotGate(2.2)",
    # swap / disc / qset subsets
    "qset tensorProd(comp[0], comp[1], hada[0])\nswap 0 ; 2",
    "qset tensorProd(comp[0], comp[1], hada[0])\ndisc [1]",
    "qset tensorProd(comp[0], comp[0])\nqset comp[1] ; 1",
    "qset tensorProd(comp[0], comp[0], comp[0])\nqset tensorProd(comp[1], comp[1]) ; [0, 2]",
    # ProbVal fan-outs
    "qset comp[0]\ngate ProbVal([0.5, 0.5], [pauliXGate, identityGate])",
    "qset tensorProd(comp[0], comp[0])\ngate pauliXGate ; ProbVal([0.25, 0.75], [0, 1])",
    "qset comp[0]\ngate pauliXGate ; 0 ; [] ; ProbVal([0.25, 0.75], [True, False])",
    "qset tensorProd(comp[0], comp[1])\ndisc ProbVal([0.5, 0.5], [0, 1])",
    "qset tensorProd(comp[0], comp[0])\nqset comp[1] ; ProbVal([0.5, 0.5], [0, 1])",
    "qset tensorProd(comp[0], comp[1], comp[0])\nswap 1 ; ProbVal([0.5, 0.5], [0, 2])",
    # measurement collapse
    "qset hada[0]\nmeas x ; comp",
    "qset bell[0]\nmeas x ; bell",
    "qset bell[0]\nmeas x ; comp ; 0",
    "qset tensorProd(comp[1], hada[0], comp[0])\nmeas x ; comp ; [0, 2]",
    "qset tensorProd(bell[0], comp[1])\npeek x ; bell ; [0, 1]",
    # control flow
    "cdef i ; 0\nmark l\ncdef i ; i + 1\nqset comp[i % 2]\ncjmp l ; i < 3",
]


@pytest.mark.parametrize("src", PROGRAMS, ids=range(len(PROGRAMS)))
def test_state_matches_reference(ref_execute, src):
    ours = executeTxt(src)
    theirs = ref_execute(src)
    np.testing.assert_allclose(ours["state"], theirs["state"], atol=1e-10)
    if "x" in theirs and hasattr(theirs["x"], "probs"):
        np.testing.assert_allclose(ours["x"].probs, theirs["x"].probs,
                                   atol=1e-10)


ALGO_RESULTS = [
    ("""
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
"""),
]


@pytest.mark.parametrize("src", ALGO_RESULTS, ids=["superdense"])
def test_results_list_matches_reference(ref_execute, src):
    ours = executeTxt(src)["results"]
    theirs = ref_execute(src)["results"]
    np.testing.assert_allclose(np.array(ours), np.array(theirs), atol=1e-10)
