"""Window/pair-kernel path perf: Pallas vs XLA on the general circuit.

A brickwork random circuit (single-qubit SU(2) layers + CX entanglers)
lowers to pair-fused window steps plus merged diagonal passes — the path
every non-Grover program takes.  Measures gates/s and effective HBM
bandwidth with the Pallas kernels ON vs OFF (XLA einsum fallback).

Run on the real TPU: PYTHONPATH=/root/repo python benchmarks/diag_window_perf.py
"""
import time

import numpy as np
import jax.numpy as jnp

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar

N = 26
LAYERS = 4
REPEATS = 64


def random_su2(rng):
    z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def brickwork_body(n, layers, seed=0):
    rng = np.random.default_rng(seed)
    c = Circuit(n)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    for layer in range(layers):
        for q in range(n):
            c.gate(random_su2(rng), [q])
        off = layer % 2
        for q in range(off, n - 1, 2):
            c.gate(X, [q + 1], controls=[q])
    return c


def measure(run, psi, label, gates, passes):
    t0 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(psi)
        _ = float(jnp.asarray(out[0, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    gb = passes * REPEATS * 2 * 2 * (2**N) * 4 / 1e9   # rd+wr, planar f32
    print(f"{label:14s} compile={t_compile:7.2f}s run={best:7.4f}s "
          f"gates/s={gates / best:12.1f} eff-BW={gb / best:7.1f} GB/s",
          flush=True)
    return out


if __name__ == "__main__":
    import sys
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    MODES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["on", "off"]
    body = brickwork_body(N, LAYERS)
    plan = compile_circuit(body, window=W)
    kinds = [type(s).__name__ for s in plan.steps]
    print(f"plan: {plan.num_passes} passes/body, steps: "
          f"{ {k: kinds.count(k) for k in set(kinds)} }", flush=True)
    gates = body.gate_count * REPEATS
    psi = zero_state_planar(N)

    outs = {}
    for mode in MODES:
        kernels.set_kernel_mode("on" if mode == "on" else "off")
        run = make_scanned_planar_runner(plan, REPEATS)
        outs[mode] = measure(run, psi, f"w={W} {mode}", gates,
                             plan.num_passes)
    if len(outs) == 2:
        a, b = outs.values()
        err = float(jnp.max(jnp.abs(a - b)))
        norm = float(jnp.sum(a**2))
        print(f"pallas-vs-xla max|Δ|={err:.2e}  ‖ψ‖²={norm:.6f}",
              flush=True)
    kernels.set_kernel_mode("auto")
