"""Real-hardware validation: every large-register collapse formulation.

The 24q scaling anchor exercised only SAMPLE-mode collapses on the chip;
this probe drives the remaining tiling-safe formulations at 22 qubits on
real hardware — exact fan-out measurement (projective AND reference-mode
relocation, i.e. _replace_block), disc fan-out (_sum_over_targets with a
tail target), and targeted qset (_insert_block / _expand) — and checks
the outcome distributions against closed-form expectations.

Usage: python benchmarks/validate_tpu_collapse.py [qubits]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qbot_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    from qbot_tpu.frontend.lowering import (
        lower_program,
        run_lowered_ensemble,
    )

    # Bell pair on (0, n-1) [tail target exercised], mid measurement,
    # targeted qset of a tail qubit, disc of another tail qubit, final
    # partial measurement. All events land in the >=17q staged regime.
    src = "\n".join([
        f"qset tensorExp(computation.kets[0], {n})",
        "gate hadamardGate ; 0",
        f"gate pauliXGate ; {n - 1} ; [0]",
        "gate hadamardGate ; 1",
        "meas a ; computation ; [0]",            # fan-out: 1/2, 1/2
        f"qset hadamard.kets[0] ; [{n - 2}]",    # targeted qset, tail
        f"meas b ; hadamard ; [{n - 2}]",        # |+> in hadamard: 1, 0
        f"disc [{n - 3}]",                       # tail disc
        f"meas c ; computation ; [0, {n - 4}]",  # post-collapse marginal
    ])
    t0 = time.perf_counter()
    lp = lower_program(src, mid_measure=True)
    res, ens = run_lowered_ensemble(lp, max_particles=16,
                                    collapse_mode="reference")
    wall = time.perf_counter() - t0
    checks = {
        "a": [0.5, 0.5],
        "b": [1.0, 0.0],
        # qubit 0 collapsed classically (correlated with n-1); qubit n-4
        # untouched |0>: marginal = [p0, 0, 1-p0, 0] with p0 in {0,1}
        # mixture -> [0.5, 0, 0.5, 0]
        "c": [0.5, 0.0, 0.5, 0.0],
    }
    ok = True
    for name, want in checks.items():
        got = res[name].probs
        good = np.allclose(got, want, atol=1e-5)
        ok &= good
        print(f"{name}: {got}  expected {want}  {'OK' if good else 'FAIL'}",
              flush=True)
    print(f"particles={ens.num_particles} lost_mass="
          f"{float(np.asarray(ens.lost_mass)):.2e} wall={wall:.1f}s "
          f"{'ALL OK' if ok else 'MISMATCH'}", flush=True)
    sys.exit(0 if ok else 1)
