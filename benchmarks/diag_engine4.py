"""Probe: synthetic chain of the EXACT engine specs vs apply_plan_dot.

diag_engine3 prices the four engine specs at ~3.3+2.6+2.3+2.3 =
~10.5 ms/round => ~31.5 ms/body, but the engine (phases stripped) runs
43.6 ms.  This probe times (a) a hand-rolled scan over the exact
engine views/specs (syn), and (b) apply_plan_dot on a single-term
window plan with the same geometry (one matrix per window, no fold,
no phases) (app).  If syn is fast and app slow, the overhead is in
apply_plan_dot's dispatch; if both are slow, it is the SEQUENCE of
views (inter-pass relayout).

Usage: python benchmarks/diag_engine4.py [syn,app]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache
from benchmarks.diag_hybrid import N, PREC, realified

K = 16
SPECS = [("xicj,cajbl->xaibl", (2, 1, 128, 4096, 128), 128),
         ("xicj,cajbl->xaibl", (2, 128, 64, 64, 128), 64),
         ("xicj,cajl->xail", (2, 8192, 64, 128), 64),
         ("xicj,caj->xai", (2, 2 ** 19, 128), 128)]


def timed(run, arg, label):
    t0 = time.perf_counter()
    out = run(arg)
    _ = float(jnp.asarray(out.reshape(-1)[0]))
    tc = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.asarray(out.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:4s} compile={tc:6.1f}s body={best/K*1e3:7.2f}ms "
          f"g/s@154={154*K/best:7.1f}", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["syn", "app"]
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p0 = jnp.asarray(psi)
    Ms = [[realified(d, 10 * wi + r) for r in range(3)]
          for wi, (_, _, d) in enumerate(SPECS)]

    if "syn" in which:
        def body(p):
            for r in range(3):
                for wi, (spec, view, d) in enumerate(SPECS):
                    out = jnp.einsum(spec, Ms[wi][r], p.reshape(view),
                                     precision=PREC)
                    p = out.reshape(2, -1)
            return p

        @jax.jit
        def run_syn(p):
            out, _ = jax.lax.scan(lambda c, _: (body(c), None), p, None,
                                  length=K)
            return out
        timed(run_syn, p0, "syn")

    if "app" in which:
        from qbot_tpu.tpu.circuit import Circuit
        from qbot_tpu.tpu.compiler import compile_circuit
        from qbot_tpu.tpu.dotplan import lower_dot_plan, apply_plan_dot

        def uni(d, seed):
            rng = np.random.default_rng(seed)
            z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
            q, r = np.linalg.qr(z)
            return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))

        c = Circuit(N)
        for r in range(3):
            for wi, (start, w) in enumerate([(0, 7), (7, 6), (13, 6),
                                             (19, 7)]):
                c.gate(uni(2 ** w, 100 * r + wi),
                       list(range(start, start + w)))
        plan = compile_circuit(c, 7, partition="dot")
        low = lower_dot_plan(plan)
        print("app windows:",
              sum(1 for s in low.steps if type(s).__name__ == "_Win"),
              flush=True)

        @jax.jit
        def run_app(p):
            def step(cr, _):
                return apply_plan_dot(cr, low, None), None
            out, _ = jax.lax.scan(step, p, None, length=K)
            return out
        timed(run_app, p0, "app")
