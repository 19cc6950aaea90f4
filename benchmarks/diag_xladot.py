"""Probe: XLA dot_general window-apply formulations vs the Pallas kernels.

Pallas DMA pipelines cap near ~210 GB/s on this stack while XLA fused
loops move ~505 GB/s (planar.py:585-594).  If a window pass can be ONE
XLA dot (realified complex algebra), its traffic is 1 read + 1 write of
the state at XLA's pipeline speed — potentially ~2x the Pallas kernels.

Variants, each scanned K deep at the 26q W(4+5) geometry:

* v1  — single dot: out[x,a,i,b] = sum_{c,j} M[x,i,c,j] p[c,a,j,b]
        (M realified (2,D,2,D); XLA may insert operand/output transposes)
* v1k — same but output left in dot-native order (x,i,a,b), next pass
        contracts from the rotated layout (axis-bookkeeping style):
        alternates between the two layouts so the scan is closed.
* v4  — planar pair carried as SEPARATE (pr, pi) arrays, 4 dots with
        fused combines (no stacked axis, no transposes).
* pallas — the production planar_window_apply (reference point).

Usage: PYTHONPATH=... python benchmarks/diag_xladot.py [v1,v1k,v4,pallas]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
S, W = 4, 5
K = 16
D = 2 ** W
A = 2 ** S
B = 2 ** N // (A * D)
PREC = jax.lax.Precision.HIGHEST


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def timed(run, arg, label):
    t0 = time.perf_counter()
    out = run(arg)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_pass = best / K
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:8s} compile={t_compile:6.1f}s pass={per_pass*1e3:7.3f}ms "
          f"eff-BW={gb/per_pass:6.1f} GB/s", flush=True)
    return out


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "v1", "v1k", "v4"]

    U = su(D, 7)
    Wr = np.real(U).astype(np.float32)
    Wi = np.imag(U).astype(np.float32)
    # realified M[x, i, c, j]: out_x = sum_c M[x,:,c,:] @ p_c
    M = np.zeros((2, D, 2, D), dtype=np.float32)
    M[0, :, 0, :] = Wr
    M[0, :, 1, :] = -Wi
    M[1, :, 0, :] = Wi
    M[1, :, 1, :] = Wr
    Mj = jnp.asarray(M)
    Wrj, Wij = jnp.asarray(Wr), jnp.asarray(Wi)

    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p4 = jnp.asarray(psi).reshape(2, A, D, B)

    if "v1" in which:
        @jax.jit
        def run_v1(p):
            def body(c, _):
                out = jnp.einsum("xicj,cajb->xaib", Mj, c, precision=PREC)
                return out, None
            out, _ = jax.lax.scan(body, p, None, length=K)
            return out
        timed(run_v1, p4, "v1")

    if "v1k" in which:
        # pass 1: (c,a,j,b) -> (x,i,a,b); pass 2 contracts (x,i) back to
        # (c,j,a,b)=(x',i',a,b): closed 2-cycle, both passes single dots
        # with ADJACENT contracted axes on the rhs (no operand transpose).
        @jax.jit
        def run_v1k(p):
            def body(c, _):
                out = jnp.einsum("xicj,cajb->xiab", Mj, c, precision=PREC)
                out = jnp.einsum("xjci,ciab->xajb", Mj, out, precision=PREC)
                return out, None
            out, _ = jax.lax.scan(body, p, None, length=K // 2)
            return out
        timed(run_v1k, p4, "v1k")

    if "v4" in which:
        @jax.jit
        def run_v4(ps):
            def body(c, _):
                pr, pi = c

                def mm(Wm, x):
                    return jnp.einsum("ij,ajb->aib", Wm, x, precision=PREC)

                out_r = mm(Wrj, pr) - mm(Wij, pi)
                out_i = mm(Wrj, pi) + mm(Wij, pr)
                return (out_r, out_i), None
            out, _ = jax.lax.scan(body, (p4[0], p4[1]), None, length=K)
            return out
        timed(run_v4, p4, "v4")

    if "pallas" in which:
        from qbot_tpu.tpu.kernels import planar_window_apply

        @jax.jit
        def run_pl(p):
            def body(c, _):
                return planar_window_apply(
                    c, N, S, W, Wrj, Wij), None
            out, _ = jax.lax.scan(body, p.reshape(2, -1), None, length=K)
            return out
        timed(run_pl, p4, "pallas")
