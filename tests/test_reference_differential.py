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


def _random_program(seed: int) -> str:
    """Random gate/swap/meas program over 2-4 qubits (property-based
    differential fodder; deterministic per seed)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 5))
    gates_1q = ["hadamardGate", "pauliXGate", "pauliYGate", "pauliZGate",
                "xRotGate(0.7)", "yRotGate(1.3)", "zRotGate(0.5)"]
    lines = [f"qset tensorExp(comp[{int(rng.integers(0, 2))}], {n})"]
    for _ in range(int(rng.integers(4, 12))):
        kind = int(rng.integers(0, 4))
        if kind == 0 or n < 2:
            q = int(rng.integers(0, n))
            g = gates_1q[int(rng.integers(0, len(gates_1q)))]
            lines.append(f"gate {g} ; {q}")
        elif kind == 1:
            t, c = (int(x) for x in rng.choice(n, 2, replace=False))
            lines.append(f"gate pauliXGate ; {t} ; [{c}]")
        elif kind == 2:
            a, b = (int(x) for x in rng.choice(n, 2, replace=False))
            lines.append(f"swap {a} ; {b}")
        else:
            q = int(rng.integers(0, n))
            lines.append(f"gate hadamardGate ; {q}")
    if rng.random() < 0.5:
        t = sorted(int(x) for x in
                   rng.choice(n, int(rng.integers(1, n)), replace=False))
        lines.append(f"meas x ; comp ; {t}")
    return "\n".join(lines)


@pytest.mark.parametrize("seed", range(20))
def test_random_program_matches_reference(ref_execute, seed):
    """Property-based: 20 random programs, bit-level state agreement."""
    src = _random_program(seed)
    ours = executeTxt(src)
    theirs = ref_execute(src)
    np.testing.assert_allclose(ours["state"], theirs["state"], atol=1e-10,
                               err_msg=src)
    if "x" in theirs:
        np.testing.assert_allclose(ours["x"].probs, theirs["x"].probs,
                                   atol=1e-10, err_msg=src)


@pytest.mark.parametrize("seed", range(6))
def test_random_program_compiled_matches_reference(ref_execute, seed):
    """The same random programs through the DEVICE engine (lowered,
    mid-measure ensemble executor) against the live reference."""
    from qbot_tpu.frontend.lowering import lower_program, run_lowered_ensemble
    from qbot_tpu.inference.ensemble_exec import ensemble_mixture

    src = _random_program(seed)
    theirs = ref_execute(src)
    lp = lower_program(src, mid_measure=True)
    results, ens = run_lowered_ensemble(lp)
    np.testing.assert_allclose(ensemble_mixture(ens), theirs["state"],
                               atol=2e-5, err_msg=src)
    if "x" in theirs and results:
        np.testing.assert_allclose(results["x"].probs, theirs["x"].probs,
                                   atol=1e-5, err_msg=src)
