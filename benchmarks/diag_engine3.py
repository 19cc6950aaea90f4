"""Probe: which generated window specs are slower than the hand specs?

diag_engine2: engine windows (no phases) = 43.6 ms/body vs hand 30.8.
Only two specs differ from the hand schedule:
* W1 [0,7): engine emits a leading size-1 'a' axis ("cajbl") where the
  hand spec has none ("cjbsl") — a degenerate batch dim may force a
  batched-matmul path.
* W4 [19,26): engine merges all leading axes ("caj", A=2^19) where the
  hand spec splits them ("cfsj").

Chains each variant K*12 deep.  Usage: python benchmarks/diag_engine3.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache
from benchmarks.diag_hybrid import F, L, N, PREC, S, realified

K = 16


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
    per = best / (K * 12)
    print(f"{label:4s} compile={tc:6.1f}s pass={per*1e3:6.3f}ms", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["a1", "a0", "m1", "m2"])
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, F, S, L)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p0 = jnp.asarray(psi)
    M7a, M7b = realified(128, 1), realified(128, 2)

    def chain(spec, view, Ma, Mb):
        @jax.jit
        def run(p):
            def b(c, _):
                out = jnp.einsum(spec, Ma, c.reshape(view), precision=PREC)
                out = jnp.einsum(spec, Mb, out.reshape(view),
                                 precision=PREC)
                return out.reshape(2, F, S, L), None
            out, _ = jax.lax.scan(b, p, None, length=K * 6)
            return out
        return run

    if "a1" in which:
        timed(chain("xicj,cajbl->xaibl", (2, 1, 128, 4096, 128),
                    M7a, M7b), p0, "a1")
    if "a0" in which:
        timed(chain("xicj,cjbl->xibl", (2, 128, 4096, 128),
                    M7a, M7b), p0, "a0")
    if "m1" in which:
        timed(chain("xicj,caj->xai", (2, 2 ** 19, 128), M7a, M7b), p0,
              "m1")
    if "m2" in which:
        timed(chain("xicj,cfsj->xfsi", (2, 8192, 64, 128), M7a, M7b), p0,
              "m2")
