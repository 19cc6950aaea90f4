"""Runtime shoot-out: Pallas vs XLA window path on a scanned random layer.

One process compiles BOTH variants of the same 26q random-circuit layer
under lax.scan (64 repeats) and times the steady-state run — the decision
data for whether the Pallas window kernels are the hot path or the XLA
einsum formulation is (VERDICT round 1, weak #1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.circuit import Circuit, random_circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar

n = 26
REPEATS = 64

body = random_circuit(n, 1, seed=5)       # one layer: 2n 1q gates + CX ladder
plan = compile_circuit(body)
print("passes/iter:", plan.num_passes, "steps:",
      [type(s).__name__ for s in plan.steps], flush=True)
psi0 = zero_state_planar(n)

for mode in ("off", "auto"):
    kernels.set_kernel_mode(mode)
    run = make_scanned_planar_runner(plan, REPEATS)
    t0 = time.perf_counter()
    out = run(psi0)
    _ = float(jnp.asarray(out[0, 0]))
    t1 = time.perf_counter()
    best = None
    for _ in range(3):
        t = time.perf_counter()
        out = run(psi0)
        _ = float(jnp.asarray(out[0, 0]))
        dt = time.perf_counter() - t
        best = dt if best is None else min(best, dt)
    state_bytes = 2 * (2**n) * 4
    gbps = 2 * state_bytes * plan.num_passes * REPEATS / best / 1e9
    print(f"mode={mode}: compile {t1-t0:.1f}s, best run {best:.3f}s, "
          f"{gbps:.0f} GB/s effective, "
          f"{body.gate_count * REPEATS / best:.0f} gates/s", flush=True)
