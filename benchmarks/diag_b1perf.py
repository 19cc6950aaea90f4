"""Probe: trailing-pair `_pair_b1` kernel cost at the 26q auto-plan geometry.

P(14+5,19+7): D1=32, D2=128, A=2^14, B=1 — tiles are contiguous (BA, D1, D2)
slabs, so any gap above the copy floor is MXU/VPU compute (the BA loop of
small matmuls).  Sweeps BA.

Usage: PYTHONPATH=... python benchmarks/diag_b1perf.py [BA ...]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.kernels import _pair_b1
from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
S1, W1, W2 = 14, 5, 7
K = 16

D1, D2 = 2 ** W1, 2 ** W2
A = 2 ** S1


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


if __name__ == "__main__":
    enable_compile_cache()
    bas = [int(x) for x in sys.argv[1:]] or [8]
    U1, U2 = su(D1, 1), su(D2, 2)
    w1s = jnp.stack([jnp.asarray(np.real(U1).astype(np.float32)),
                     jnp.asarray(np.imag(U1).astype(np.float32))])
    w2ts = jnp.stack([jnp.asarray(np.real(U2).T.copy().astype(np.float32)),
                      jnp.asarray(np.imag(U2).T.copy().astype(np.float32))])
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p = jnp.asarray(psi).reshape(2, A, D1, D2)

    for ba in bas:
        kernels._PAIR_BA = ba

        @jax.jit
        def run(p0):
            def body(c, _):
                return _pair_b1(w1s, w2ts, c), None
            out, _ = jax.lax.scan(body, p0, None, length=K)
            return out

        t0 = time.perf_counter()
        out = run(p)
        _ = float(jnp.asarray(out[0, 0, 0, 0]))
        t_compile = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(p)
            _ = float(jnp.asarray(out[0, 0, 0, 0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_pass = best / K
        gb = 2 * 2 * (2 ** N) * 4 / 1e9
        print(f"pair_b1 BA={ba:3d} compile={t_compile:6.1f}s "
              f"pass={per_pass*1e3:7.3f}ms eff-BW={gb/per_pass:6.1f} GB/s",
              flush=True)
    kernels._PAIR_BA = 8
