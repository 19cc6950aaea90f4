"""Probe: pinned (8,128)-tail views kill inter-pass relayouts?

Theory (from diag_fast620 + K=64 re-measurement): a lone dot pass runs
2.08 ms (518 GB/s) but full dot-engine plans pay ~5.6 ms/pass — XLA
retiles the state whenever consecutive views change the last-two dims.
If every view ends with the SAME (8, 128) axes, leading-dim re-splits
are layout-preserving bitcasts and chained dots over DIFFERENT windows
should run at the lone-pass rate.

Scans K=64 passes alternating TWO different front windows over a
(2, F, 8, 128) carrier at 26 qubits:

* pin   — views (2, A, D, B', 8, 128), contraction away from the tail,
          outputs in dot-native order (window to front).
* flat  — same logical passes but through a (2, 2^26) flat carrier and
          (2, A, D, B) views (the current dotplan style), for contrast.

Usage: PYTHONPATH=... python benchmarks/diag_pintail.py [pin,flat]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 64
PREC = jax.lax.Precision.HIGHEST


def realified(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    U = q * (np.conj(r.diagonal() / np.abs(r.diagonal())))
    Wr, Wi = np.real(U).astype(np.float32), np.imag(U).astype(np.float32)
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
    tc = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.asarray(out.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / K
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:6s} compile={tc:6.1f}s pass={per*1e3:7.3f}ms "
          f"eff-BW={gb/per:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["pin", "flat"]
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** (N - 10), 8, 128)).astype(np.float32)
    p0 = jnp.asarray(psi)
    # two 5-qubit windows inside the leading 16 qubits: W(0+5), W(5+5)
    # after W(0+5) moves to front the layout is (w0, rest...), where
    # W(5+5)'s axes sit at positions 5..9 — same geometry each time, so
    # a 2-cycle of genuinely different contractions.
    Ma, Mb = realified(32, 1), realified(32, 2)

    if "pin" in which:
        @jax.jit
        def run_pin(p):
            def body(c, _):
                # W at front: (2, 32, 2^11, 8, 128), contract (c, j)
                out = jnp.einsum("xicj,cjbsl->xibsl",
                                 Ma, c.reshape(2, 32, -1, 8, 128),
                                 precision=PREC)
                # W at positions 5..9: (2, 32, 32, 2^6, 8, 128)
                out = jnp.einsum("xicj,cajbsl->xiabsl",
                                 Mb, out.reshape(2, 32, 32, -1, 8, 128),
                                 precision=PREC)
                return out.reshape(p0.shape), None
            out, _ = jax.lax.scan(body, p, None, length=K // 2)
            return out
        timed(run_pin, p0, "pin")

    if "flat" in which:
        pf = p0.reshape(2, -1)

        @jax.jit
        def run_flat(p):
            def body(c, _):
                out = jnp.einsum("xicj,cjb->xib",
                                 Ma, c.reshape(2, 32, -1), precision=PREC)
                out = jnp.einsum("xicj,cajb->xiab",
                                 Mb, out.reshape(2, 32, 32, -1),
                                 precision=PREC)
                return out.reshape(2, -1), None
            out, _ = jax.lax.scan(body, p, None, length=K // 2)
            return out
        timed(run_flat, pf, "flat")
