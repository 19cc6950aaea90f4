"""Dot engine vs Pallas pair-fused path on the 26q general brickwork.

Usage: PYTHONPATH=... python benchmarks/diag_dotbench.py [widths] [modes]
  widths: comma list (default 5,6,7)
  modes:  dot,pallas (default dot)
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.dotplan import make_scanned_dot_runner
from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar
from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
LAYERS = 4
REPEATS = 64


def brickwork_body(n, layers, seed=0):
    from qbot_tpu.tpu.circuit import Circuit
    rng = np.random.default_rng(seed)
    c = Circuit(n)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    for layer in range(layers):
        for q in range(n):
            z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
            qm, r = np.linalg.qr(z)
            c.gate(qm * np.conj(r.diagonal() / np.abs(r.diagonal())), [q])
        for q in range(layer % 2, n - 1, 2):
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
    per_pass = best / (passes * REPEATS)
    print(f"{label:16s} compile={t_compile:7.1f}s run={best:7.4f}s "
          f"gates/s={gates / best:10.1f} "
          f"({passes} passes/body, {per_pass*1e3:6.3f} ms/pass)",
          flush=True)
    return out


if __name__ == "__main__":
    enable_compile_cache()
    widths = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                               else "5,6,7").split(",")]
    modes = (sys.argv[2] if len(sys.argv) > 2 else "dot").split(",")
    if len(sys.argv) > 3:
        kernels.set_dot_mode(sys.argv[3])
    body = brickwork_body(N, LAYERS)
    gates = body.gate_count * REPEATS
    psi = zero_state_planar(N)
    outs = {}
    for w in widths:
        plan = compile_circuit(body, window=w,
                               partition="dot" if modes == ["dot"]
                               else "pallas")
        from qbot_tpu.tpu.compiler import PairStep, WindowStep
        nwin = sum(2 if isinstance(s, PairStep) else 1
                   for s in plan.steps if isinstance(s, (PairStep,
                                                         WindowStep)))
        if "dot" in modes:
            kernels.set_kernel_mode("off")
            run = make_scanned_dot_runner(plan, REPEATS)
            if run is None:
                print(f"w={w}: dot lowering failed", flush=True)
            else:
                outs[f"dot{w}"] = measure(run, psi, f"dot w={w}", gates,
                                          nwin)
        if "pallas" in modes:
            kernels.set_kernel_mode("on")
            run = make_scanned_planar_runner(plan, REPEATS)
            outs[f"pallas{w}"] = measure(run, psi, f"pallas w={w}",
                                         gates, plan.num_passes)
        kernels.set_kernel_mode("auto")
    keys = list(outs)
    for i in range(1, len(keys)):
        d = float(jnp.max(jnp.abs(outs[keys[i]] - outs[keys[0]])))
        print(f"max|{keys[i]} - {keys[0]}| = {d:.2e}", flush=True)
