"""Benchmark: gate-applications/s on one chip (BASELINE north-star metric).

Runs Grover search at 26 qubits on the TPU statevector engine (window-fused
plan under lax.scan) and reports logical gate applications per second.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the same-task, same-qubit-count dense NumPy contraction path —
the strongest CPU formulation of the reference's math (the reference's own
O(8^n) full-space-operator design cannot represent 26 qubits at all; its
ceiling is ~13-14 qubits, SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np

N = 26
REPEATS = 512          # Grover iterations timed (scanned body)
BASELINE_GATES = 4     # numpy same-task gates to time for the ratio


def tpu_gates_per_sec() -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    from qbot_tpu.tpu.circuit import Circuit
    from qbot_tpu.tpu.compiler import compile_circuit
    from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar

    n = N
    init = Circuit(n)
    for q in range(n):
        init.h(q)
    body = Circuit(n)
    body.phase_flip(12345)
    for q in range(n):
        body.h(q)
    body.phase_flip(0)
    for q in range(n):
        body.h(q)

    body_plan = compile_circuit(body)
    run = make_scanned_planar_runner(body_plan, REPEATS,
                                     init_plan=compile_circuit(init))
    psi0 = zero_state_planar(n)

    out = None

    def timed_run():
        # fetch a scalar to force full completion: block_until_ready alone
        # does not synchronise through the axon remote-execution tunnel
        nonlocal out
        t0 = time.perf_counter()
        out = run(psi0)
        _ = float(jnp.asarray(out[0, 0]))
        return time.perf_counter() - t0

    compile_s = timed_run()                # compile + first run
    elapsed = min(timed_run() for _ in range(2))

    # numeric correctness on the real chip: Grover's marked-state
    # probability after R iterations is sin²((2R+1)·asin(2^{-n/2}))
    # in exact arithmetic — a hardware-precision canary
    amp = jnp.asarray(out[:, 12345])
    p_marked = float(amp[0]) ** 2 + float(amp[1]) ** 2
    import math
    p_expected = math.sin((2 * REPEATS + 1) * math.asin(2 ** (-n / 2))) ** 2

    gates = body.gate_count * REPEATS + init.gate_count
    info = {
        "qubits": n,
        "grover_iterations": REPEATS,
        "hbm_passes_per_iteration": body_plan.num_passes,
        "compile_seconds": round(compile_s, 2),
        "run_seconds": round(elapsed, 4),
        "marked_prob": round(p_marked, 8),
        "marked_prob_expected": round(p_expected, 8),
        "device": str(jax.devices()[0]),
    }
    return gates / elapsed, info


def numpy_baseline_gates_per_sec() -> float:
    """Same task on CPU NumPy: contraction-based statevector gate apply.

    Warm-up gate first (first-touch allocation), then per-gate median —
    the raw first-run timing is noisy at 0.5 GB working set.
    """
    from qbot_tpu.ops import core, gates

    psi = np.zeros(2**N, dtype=np.complex64)
    psi[0] = 1.0
    h = gates.hadamard().astype(np.complex64)
    psi = core.apply_gate_state(psi, h, [0])       # warm-up
    times = []
    for q in range(1, 1 + BASELINE_GATES):
        t0 = time.perf_counter()
        psi = core.apply_gate_state(psi, h, [q])
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1.0 / times[len(times) // 2]


def main():
    value, info = tpu_gates_per_sec()
    baseline = numpy_baseline_gates_per_sec()
    out = {
        "metric": f"gate-applications/s/chip @ {N} qubits (Grover, statevector)",
        "value": round(value, 1),
        "unit": "gates/s",
        "vs_baseline": round(value / baseline, 2),
        "baseline_cpu_numpy_gates_per_s": round(baseline, 2),
        **info,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
