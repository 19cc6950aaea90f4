"""Probe: single-window `_left_multiply` pass time vs tile contiguity.

The strided (2,1,D,block_b) tiles with 2KB rows cap at ~210 GB/s
(diag_pairperf.py).  When block_b == B the whole per-``a`` slab is one
CONTIGUOUS chunk; when block_b*4 >= 16KB the strided rows amortise.
This times W(4+5) and W(9+5) of the 26q auto plan at several block_b.

Usage: PYTHONPATH=... python benchmarks/diag_contig.py [s,w,block[,block..]]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.kernels import _left_multiply
from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 16


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def run_case(s, w, block_b, psi_dev):
    D = 2 ** w
    A = 2 ** s
    B = 2 ** N // (A * D)
    block_b = min(block_b, B)
    U = su(D, s * 100 + w)
    wst = jnp.stack([jnp.asarray(np.real(U).astype(np.float32)),
                     jnp.asarray(np.imag(U).astype(np.float32))])
    p = psi_dev.reshape(2, A, D, B)

    @jax.jit
    def run(p0):
        def body(c, _):
            return _left_multiply(wst, c, block_b), None
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
    rows = "contig" if block_b == B else f"rows {block_b*4//1024}KB"
    print(f"W({s}+{w}) block_b={block_b:6d} ({rows:10s}) "
          f"compile={t_compile:6.1f}s pass={per_pass*1e3:7.3f}ms "
          f"eff-BW={gb/per_pass:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    enable_compile_cache()
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    psi_dev = jnp.asarray(psi)

    cases = []
    for arg in sys.argv[1:]:
        parts = [int(x) for x in arg.split(",")]
        s, w = parts[0], parts[1]
        for b in parts[2:]:
            cases.append((s, w, b))
    if not cases:
        cases = [(9, 5, 4096), (4, 5, 32768), (4, 5, 4096)]
    for s, w, b in cases:
        run_case(s, w, b, psi_dev)
