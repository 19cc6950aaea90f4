"""Probe: does carrying (re, im) as SEPARATE arrays double XLA bandwidth?

The scanned Grover reflect runner (separate planes, fused elementwise)
measures ~622 GB/s; a bare multiply on the stacked (2, 2^26) state only
~316 GB/s.  If the stacked leading axis is the difference, the window
engine should carry separate planes too.

* xsep  — elementwise multiply on separate (pr, pi) arrays.
* d4    — window apply as 4 dots on separate planes with fused combines:
          out_r = Wr@pr - Wi@pi ; out_i = Wr@pi + Wi@pr  (W(4+5) geom).
* d4w7  — same at w=7.
* d2    — Karatsuba-style 3-dot variant: m1=Wr@pr, m2=Wi@pi,
          m3=(Wr+Wi)@(pr+pi); out_r=m1-m2, out_i=m3-m1-m2.

Usage: PYTHONPATH=... python benchmarks/diag_sepplane.py [variants]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 16
TOT = 2 ** N
PREC = jax.lax.Precision.HIGHEST


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def timed(run, args, label, nbytes):
    t0 = time.perf_counter()
    out = run(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / K
    print(f"{label:6s} compile={t_compile:6.1f}s pass={per*1e3:7.3f}ms "
          f"eff-BW={nbytes / per / 1e9:6.1f} GB/s", flush=True)


def window_runner(s, w, combine):
    D = 2 ** w
    A = 2 ** s
    B = TOT // (A * D)
    U = su(D, s + w)
    Wr = jnp.asarray(np.real(U).astype(np.float32))
    Wi = jnp.asarray(np.imag(U).astype(np.float32))

    @jax.jit
    def run(pr, pi):
        def body(c, _):
            return combine(Wr, Wi, c[0], c[1]), None
        out, _ = jax.lax.scan(
            body, (pr.reshape(A, D, B), pi.reshape(A, D, B)), None,
            length=K)
        return out
    return run


def comb4(Wr, Wi, pr, pi):
    def mm(Wm, x):
        return jnp.einsum("ij,ajb->aib", Wm, x, precision=PREC)
    return mm(Wr, pr) - mm(Wi, pi), mm(Wr, pi) + mm(Wi, pr)


def comb3(Wr, Wi, pr, pi):
    def mm(Wm, x):
        return jnp.einsum("ij,ajb->aib", Wm, x, precision=PREC)
    m1 = mm(Wr, pr)
    m2 = mm(Wi, pi)
    m3 = mm(Wr + Wi, pr + pi)
    return m1 - m2, m3 - m1 - m2


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "xsep", "d4", "d4w7"]
    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.normal(size=TOT).astype(np.float32))
    pi = jnp.asarray(rng.normal(size=TOT).astype(np.float32))
    full = 2 * TOT * 4

    if "xsep" in which:
        @jax.jit
        def run_xsep(a, b):
            def body(c, _):
                return (c[0] * np.float32(1.0000001),
                        c[1] * np.float32(1.0000001)), None
            out, _ = jax.lax.scan(body, (a, b), None, length=K)
            return out
        timed(run_xsep, (pr.reshape(TOT // 2048, 2048),
                         pi.reshape(TOT // 2048, 2048)), "xsep", 2 * full)
    if "d4" in which:
        timed(window_runner(4, 5, comb4), (pr, pi), "d4", 2 * full)
    if "d4w7" in which:
        timed(window_runner(5, 7, comb4), (pr, pi), "d4w7", 2 * full)
    if "d3" in which:
        timed(window_runner(4, 5, comb3), (pr, pi), "d3", 2 * full)
