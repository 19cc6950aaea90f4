"""Probe 2: XLA dot-engine floor — native-order cycles, widths, precision.

* nat   — closed 2-cycle at A == D == 32 (s=5,w=5) where BOTH dots emit
          dot-native output order (x,i,...) with zero output permutation.
* front — window at the very front (A=1): contracting dims (c,j) are
          ADJACENT and collapse without any transpose: (2D, 2D)@(2D, R).
* w7    — native cycle at w=7 (D=128, s=5): MXU load 4x of w=5.
* bf16  — w7 cycle at precision DEFAULT (single-pass bf16 MXU).
* h3    — w7 cycle at precision HIGH (3-pass bf16).

Usage: PYTHONPATH=... python benchmarks/diag_xladot2.py [list]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 16


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def realified(d, seed):
    U = su(d, seed)
    Wr = np.real(U).astype(np.float32)
    Wi = np.imag(U).astype(np.float32)
    M = np.zeros((2, d, 2, d), dtype=np.float32)
    M[0, :, 0, :] = Wr
    M[0, :, 1, :] = -Wi
    M[1, :, 0, :] = Wi
    M[1, :, 1, :] = Wr
    return jnp.asarray(M)


def timed(run, arg, label):
    t0 = time.perf_counter()
    out = run(arg)
    _ = float(jnp.asarray(out.reshape(-1)[0]))
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.asarray(out.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_pass = best / K
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:8s} compile={t_compile:6.1f}s pass={per_pass*1e3:7.3f}ms "
          f"eff-BW={gb/per_pass:6.1f} GB/s", flush=True)


def cycle_runner(Mj, spec1, spec2, prec, halfk=True):
    @jax.jit
    def run(p):
        def body(c, _):
            out = jnp.einsum(spec1, Mj, c, precision=prec)
            out = jnp.einsum(spec2, Mj, out, precision=prec)
            return out, None
        out, _ = jax.lax.scan(body, p, None, length=K // 2)
        return out
    return run


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "nat", "front", "w7"]
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    HI = jax.lax.Precision.HIGHEST

    if "nat" in which:
        # s=5, w=5: (2, 32, 32, 2^16); cycle (c,a,j,b)->(x,i,a,b)->back
        M5 = realified(32, 1)
        p = jnp.asarray(psi).reshape(2, 32, 32, -1)
        timed(cycle_runner(M5, "xicj,cajb->xiab", "xjci,ciab->xjab", HI),
              p, "nat")
    if "front" in which:
        # front window w=6: (2, 64, 2^20): adjacent (c,j), fully collapsible
        M6 = realified(64, 2)
        p = jnp.asarray(psi).reshape(2, 64, -1)
        @jax.jit
        def run_front(p0):
            def body(c, _):
                return jnp.einsum("xicj,cjr->xir", M6, c, precision=HI), None
            out, _ = jax.lax.scan(body, p0, None, length=K)
            return out
        timed(run_front, p, "front")
    for label, prec in (("w7", HI), ("h3", jax.lax.Precision.HIGH),
                        ("bf16", jax.lax.Precision.DEFAULT)):
        if label in which:
            # s=7, w=7: (2, 128, 128, 2^12) closed native cycle
            M7 = realified(128, 3)
            p = jnp.asarray(psi).reshape(2, 128, 128, -1)
            timed(cycle_runner(M7, "xicj,cajb->xiab", "xjci,ciab->xjab",
                               prec), p, label)
