"""Round-2 compile-time diagnosis for the scanned reflect runner.

Isolates what the 184 s bench compile (BENCH_r01.json) is spent on:
scan length, state size, fused-flip constant chains, or the init plan.
Run on the real TPU: python benchmarks/diag_compile2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar


def build(n, repeats, with_init=True, with_flips=True):
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
    return make_scanned_planar_runner(
        compile_circuit(body), repeats,
        init_plan=compile_circuit(init) if with_init else None)


def timed(label, n, repeats, **kw):
    run = build(n, repeats, **kw)
    psi = zero_state_planar(n)
    t0 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t1 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t2 = time.perf_counter()
    print(f"{label:40s} compile+run={t1-t0:8.2f}s  run={t2-t1:7.4f}s",
          flush=True)


if __name__ == "__main__":
    import sys
    for spec in sys.argv[1:]:
        parts = spec.split(",")
        n, r = int(parts[0]), int(parts[1])
        kw = {}
        if "noinit" in parts:
            kw["with_init"] = False
        if "noflips" in parts:
            kw["with_flips"] = False
        timed(spec, n, r, **kw)
