"""Component-level compile-time attribution at a given qubit count.

Times jit-compile of (a) the init H-layer plan alone, (b) the scanned
reflection body alone, (c) the XLA-fallback scan, separately.
Usage: python benchmarks/diag_compile3.py <n> <component> [repeats]
components: init | scan | scan-noflips | both
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import (
    make_planar_runner,
    make_scanned_planar_runner,
    zero_state_planar,
)


def build_plans(n, with_flips=True):
    init = Circuit(n)
    for q in range(n):
        init.h(q)
    body = Circuit(n)
    if with_flips:
        body.phase_flip(12345)
    for q in range(n):
        body.h(q)
    body.phase_flip(0)
    for q in range(n):
        body.h(q)
    return compile_circuit(init), compile_circuit(body)


def timeit(run, psi, label):
    t0 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t1 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t2 = time.perf_counter()
    print(f"{label:24s} compile+run={t1-t0:8.2f}s  run={t2-t1:7.4f}s",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1])
    comp = sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    psi = zero_state_planar(n)
    # warm up the backend/toolchain on a tiny unrelated program first
    jnp.zeros((8,)).sum().block_until_ready()
    init_plan, body_plan = build_plans(n, with_flips="noflips" not in comp)
    if comp == "init":
        timeit(make_planar_runner(init_plan), psi, f"n={n} init-only")
    elif comp.startswith("scan"):
        run = make_scanned_planar_runner(body_plan, repeats, init_plan=None)
        timeit(run, psi, f"n={n} {comp} r={repeats}")
    elif comp == "both":
        run = make_scanned_planar_runner(body_plan, repeats,
                                         init_plan=init_plan)
        timeit(run, psi, f"n={n} both r={repeats}")
