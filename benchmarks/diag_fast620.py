"""Probe: what lets the scanned reflect loop move ~620 GB/s when a bare
elementwise multiply on the same data measures only ~300?

Candidates isolated one at a time (all separate-plane carries, scan x16):

* mulHT  — bare multiply at the reflect runner's exact shapes (2^17, 512).
* rank1  — the reflect body shape: out = p - 2*(c*v) with v = A (H,1)
           broadcast times B (1,T), PLUS the fused partial-sum reductions
           carried as scalars (exactly _make_scanned_reflect_runner's
           structure, minus flips).
* mulpair— multiply with TWO separate carried arrays (pr, pi) where the
           body mixes them (pr' = a*pr - b*pi style, complex-ish).

Usage: PYTHONPATH=... python benchmarks/diag_fast620.py [variants]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 16
H = 2 ** 17
T = 2 ** (N - 17)        # 512


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
    print(f"{label:8s} compile={t_compile:6.1f}s pass={per*1e3:7.3f}ms "
          f"eff-BW={nbytes / per / 1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "mulHT", "rank1", "mulpair"]
    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.normal(size=(H, T)).astype(np.float32))
    pi = jnp.asarray(rng.normal(size=(H, T)).astype(np.float32))
    full = 2 * (2 ** N) * 4          # both planes once

    if "mulHT" in which:
        @jax.jit
        def run_m(a, b):
            def body(c, _):
                return (c[0] * np.float32(1.0000001),
                        c[1] * np.float32(1.0000001)), None
            out, _ = jax.lax.scan(body, (a, b), None, length=K)
            return out
        timed(run_m, (pr, pi), "mulHT", 2 * full)

    if "rank1" in which:
        ar = jnp.asarray(rng.normal(size=(H, 1)).astype(np.float32))
        ai = jnp.asarray(rng.normal(size=(H, 1)).astype(np.float32))
        br = jnp.asarray(rng.normal(size=(1, T)).astype(np.float32))
        bi = jnp.asarray(rng.normal(size=(1, T)).astype(np.float32))

        @jax.jit
        def run_r(a, b):
            def body(c, _):
                xr, xi, cr, ci = c
                qr = cr * br - ci * bi
                qi = cr * bi + ci * br
                outr = xr - 2.0 * (ar * qr - ai * qi)
                outi = xi - 2.0 * (ar * qi + ai * qr)
                ncr = jnp.sum((ar * br) * outr + (ai * bi) * outi)
                nci = jnp.sum((ar * br) * outi - (ai * bi) * outr)
                return (outr, outi, ncr, nci), None
            out, _ = jax.lax.scan(
                body, (a, b, jnp.float32(0.1), jnp.float32(0.1)), None,
                length=K)
            return out
        timed(run_r, (pr, pi), "rank1", 2 * full)

    if "mulpair" in which:
        @jax.jit
        def run_p(a, b):
            def body(c, _):
                xr, xi = c
                return (xr * np.float32(0.9999) - xi * np.float32(1e-4),
                        xr * np.float32(1e-4) + xi * np.float32(0.9999)), \
                    None
            out, _ = jax.lax.scan(body, (a, b), None, length=K)
            return out
        timed(run_p, (pr, pi), "mulpair", 2 * full)
