"""Probe: in-place window contractions (no move-to-front, no perm).

diag_hybrid measured: tail windows that contract IN PLACE (output axis
order preserved, "->xfil"/"->xfsi") run 2.2 ms/pass, while front windows
that move the window to the front (dot-native output) cost ~4.3 ms.  If
a front window can also contract in place ("xicj,cajsl->xaisl") at the
tail rate, the whole dot engine needs NO permutation tracking and the
12-pass brickwork body drops to ~26 ms (~5,800 gates/s).

Variants:
* inpl  — full 12-pass body, every window in place.
* front — chained W2-style in-place front windows only ("->xaisl").
* mid   — chained middle windows with BOTH a and b present ("->xaibsl").

Usage: python benchmarks/diag_hybrid2.py [inpl,front,mid]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache
from benchmarks.diag_hybrid import (
    F, L, N, PREC, S, apply_mask, mask_vecs, realified,
)

K = 16


def timed(run, arg, label, passes):
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
    body = best / K
    per = body / passes
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:7s} compile={tc:6.1f}s body={body*1e3:7.2f}ms "
          f"pass={per*1e3:6.3f}ms eff-BW={gb/per:6.1f} GB/s "
          f"g/s@154={154/body:7.1f}", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["inpl", "front", "mid"])
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, F, S, L)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p0 = jnp.asarray(psi)

    if "inpl" in which:
        M1 = [realified(128, 10 + r) for r in range(3)]
        M2 = [realified(64, 20 + r) for r in range(3)]
        M3 = [realified(64, 30 + r) for r in range(3)]
        M4 = [realified(128, 40 + r) for r in range(3)]
        masks = [mask_vecs(50 + i) for i in range(6)]

        def bodyf(p):
            mi = iter(masks)
            for r in range(3):
                # W1 [0,7): in place == dot-native at p=0
                out = jnp.einsum("xicj,cjbsl->xibsl", M1[r],
                                 p.reshape(2, 128, F // 128, S, L),
                                 precision=PREC)
                p = out.reshape(2, F, S, L)
                # W2 [7,13): in place, transposed output
                out = jnp.einsum("xicj,cajsl->xaisl", M2[r],
                                 p.reshape(2, 128, 64, S, L),
                                 precision=PREC)
                p = out.reshape(2, F, S, L)
                if r < 2:
                    p = apply_mask(p, next(mi))
                out = jnp.einsum("xicj,cfjl->xfil", M3[r],
                                 p.reshape(2, F, S, L), precision=PREC)
                p = out.reshape(2, F, S, L)
                if r < 2:
                    p = apply_mask(p, next(mi))
                out = jnp.einsum("xicj,cfsj->xfsi", M4[r],
                                 p.reshape(2, F, S, L), precision=PREC)
                p = out.reshape(2, F, S, L)
                if r < 2:
                    p = apply_mask(p, next(mi))
            return p

        @jax.jit
        def run_inpl(p):
            out, _ = jax.lax.scan(lambda c, _: (bodyf(c), None), p, None,
                                  length=K)
            return out
        timed(run_inpl, p0, "inpl", 12)

    if "front" in which:
        Ma, Mb = realified(64, 1), realified(64, 2)

        @jax.jit
        def run_front(p):
            def b(c, _):
                out = jnp.einsum("xicj,cajsl->xaisl", Ma,
                                 c.reshape(2, 128, 64, S, L),
                                 precision=PREC)
                out = jnp.einsum("xicj,cajsl->xaisl", Mb,
                                 out.reshape(2, 128, 64, S, L),
                                 precision=PREC)
                return out.reshape(2, F, S, L), None
            out, _ = jax.lax.scan(b, p, None, length=K * 6)
            return out
        timed(run_front, p0, "front", 12)

    if "mid" in which:
        Ma, Mb = realified(32, 1), realified(32, 2)

        @jax.jit
        def run_mid(p):
            def b(c, _):
                # window [2,7): view (2, 4, 32, 64, S, L)
                out = jnp.einsum("xicj,cajbsl->xaibsl", Ma,
                                 c.reshape(2, 4, 32, 64, S, L),
                                 precision=PREC)
                out = jnp.einsum("xicj,cajbsl->xaibsl", Mb,
                                 out.reshape(2, 4, 32, 64, S, L),
                                 precision=PREC)
                return out.reshape(2, F, S, L), None
            out, _ = jax.lax.scan(b, p, None, length=K * 6)
            return out
        timed(run_mid, p0, "mid", 12)
