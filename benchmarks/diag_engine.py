"""Probe: time the REAL dot-engine runner on the bench brickwork body.

Times make_scanned_dot_runner on the exact plan bench.py compiles, so
engine-level regressions against the hand-rolled diag_hybrid3 schedule
(~34 ms/body) are visible without running the whole bench.

Usage: python benchmarks/diag_engine.py [repeats]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import bench
    from qbot_tpu.tpu.compiler import compile_circuit, dot_cost_model
    from qbot_tpu.tpu.dotplan import make_scanned_dot_runner
    from qbot_tpu.tpu.planar import zero_state_planar

    body = bench._brickwork(26, 4)
    plan = compile_circuit(body, window="auto")
    print("engine:", plan.engine, " modeled:",
          round(dot_cost_model(plan) * 1e3, 2), "ms/body", flush=True)
    run = make_scanned_dot_runner(plan, K)
    psi0 = zero_state_planar(26)
    t0 = time.perf_counter()
    out = run(psi0)
    _ = float(jnp.asarray(out[0, 0]))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(psi0)
        _ = float(jnp.asarray(out[0, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    body_ms = best / K * 1e3
    print(f"body={body_ms:.2f}ms  g/s@154={154/best*K:.1f}  "
          f"norm={float(jnp.sum(out**2)):.6f}", flush=True)
