"""Probe: where do the ~15 ms/body between the dot ENGINE (49.9 ms) and
the hand-rolled diag_hybrid3 schedule (34.3 ms) go?

Variants (same compiled brickwork plan, lowered steps modified):
* eng  — the engine as shipped.
* nop  — phases stripped from the lowered steps (isolates mask cost).
* sub6 — phase carrier patched from (2^16, 8, 128) to (2^13, 64, 128)
         (the hand probe's carrier).
* mat  — window matrices pre-folded on the HOST (numpy) instead of
         in-trace (isolates constant-folding failures).

Usage: python benchmarks/diag_engine2.py [eng,nop,sub6,mat]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache


def timed(run, psi0, label):
    t0 = time.perf_counter()
    out = run(psi0)
    _ = float(jnp.asarray(out[0, 0]))
    tc = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(psi0)
        _ = float(jnp.asarray(out[0, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:5s} compile={tc:6.1f}s body={best/K*1e3:7.2f}ms "
          f"g/s@154={154*K/best:7.1f}", flush=True)


K = 16

if __name__ == "__main__":
    enable_compile_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["eng", "nop", "sub6", "mat"])
    import bench
    from qbot_tpu.tpu import dotplan
    from qbot_tpu.tpu.compiler import compile_circuit
    from qbot_tpu.tpu.dotplan import (
        _Win, apply_plan_dot, lower_dot_plan,
    )
    from qbot_tpu.tpu.planar import zero_state_planar

    body = bench._brickwork(26, 4)
    plan = compile_circuit(body, window="auto")
    psi0 = zero_state_planar(26)

    def scan_runner(lowered):
        @jax.jit
        def run(psi):
            def step(c, _):
                return apply_plan_dot(c, lowered, None), None
            out, _ = jax.lax.scan(step, psi, None, length=K)
            return out
        return run

    if "eng" in which:
        timed(scan_runner(lower_dot_plan(plan)), psi0, "eng")

    if "nop" in which:
        low = lower_dot_plan(plan)
        steps = [(_Win(s.step, s.view, s.spec, s.flips, ())
                  if isinstance(s, _Win) else s) for s in low.steps]
        low2 = dotplan.DotPlan(low.n, low.num_params, steps, low.tail,
                               low.entry_perm, low.final_perm)
        timed(scan_runner(low2), psi0, "nop")

    if "sub6" in which:
        saved = dotplan._SUB_LOG2
        dotplan._SUB_LOG2 = 6
        try:
            low3 = lower_dot_plan(plan)
            timed(scan_runner(low3), psi0, "sub6")
        finally:
            dotplan._SUB_LOG2 = saved

    if "mat" in which:
        from qbot_tpu.tpu.planar import fold_window_static
        low = lower_dot_plan(plan)
        steps = []
        for s in low.steps:
            if isinstance(s, _Win):
                W = fold_window_static(s.step)
                from qbot_tpu.tpu.compiler import Term, WindowStep
                st = WindowStep(s.step.start, s.step.width,
                                (Term(tuple(range(s.step.width)),
                                      np.asarray(W)),),
                                s.step.pre_flips, s.step.pre_phases)
                steps.append(_Win(st, s.view, s.spec, s.flips, s.phases))
            else:
                steps.append(s)
        low4 = dotplan.DotPlan(low.n, low.num_params, steps, low.tail,
                               low.entry_perm, low.final_perm)
        timed(scan_runner(low4), psi0, "mat")
