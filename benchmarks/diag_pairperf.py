"""Probe: where does the 26q pair-window pass time go?

Times, on the real TPU, a scanned chain of K identical passes over a
(2, 2^26) planar state for several kernel formulations of the SAME
logical op (apply W1 (D1) and W2 (D2) to a pair of contiguous windows):

* ``copy``     — pure DMA in/out with the production tile geometry: the
                 grid-overhead + bandwidth floor. Anything above this is
                 compute or scheduling.
* ``pair``     — the production ``_pair_bt`` kernel (4 real matmuls per
                 contraction, f32 HIGHEST).
* ``pairBA``   — same but tiling BA rows of A per grid step (fewer steps).
* ``real2x``   — real-ified complex product: one (2D, 2D) matmul per
                 contraction via [[Wr,-Wi],[Wi,Wr]] — 2x the K/M of the
                 4-matmul form at identical FLOPs (MXU utilization probe).

Usage: PYTHONPATH=/root/repo python benchmarks/diag_pairperf.py [reps]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
S1, W1, W2 = 4, 5, 5          # P(4+5,9+5) from the auto plan
K = 16                        # passes per timed call (scanned)

D1, D2 = 2 ** W1, 2 ** W2
A = 2 ** S1
B = 2 ** N // (A * D1 * D2)


def su(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def timed(fn, psi, label, extra=""):
    t0 = time.perf_counter()
    out = fn(psi)
    _ = float(jnp.asarray(out.reshape(-1)[0]))
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(psi)
        _ = float(jnp.asarray(out.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_pass = best / K
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:10s} compile={t_compile:7.1f}s  pass={per_pass*1e3:7.3f}ms"
          f"  eff-BW={gb / per_pass:6.1f} GB/s  {extra}", flush=True)
    return out, per_pass


# --- copy kernel: production tile geometry, no compute -------------------

def _copy_body(p_ref, o_ref):
    o_ref[...] = p_ref[...]


@functools.partial(jax.jit, static_argnames=("block_b",))
def copy_pass(p, block_b=128):
    grid = (A, pl.cdiv(B, block_b))
    return pl.pallas_call(
        _copy_body,
        grid=grid,
        in_specs=[pl.BlockSpec((2, 1, D1, D2, block_b),
                               lambda a, b: (0, a, 0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 1, D1, D2, block_b),
                               lambda a, b: (0, a, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(p)


# --- real-ified kernel: one (2D, 2D) matmul per contraction ---------------
# tile (2, BA, D1, D2, Bt); contraction 1: fold planar pair into rows:
# x2[(c d1), (d2 bt)] -> y = M1 @ x2 with M1 = [[W1r,-W1i],[W1i,W1r]]
# contraction 2 via pre-transposed M2t on the (d2) axis per d1 row.

def _real2x_body(m1_ref, m2t_ref, p_ref, o_ref, *, BA, block_b):
    m1 = m1_ref[...]                    # (2*D1, 2*D1)
    m2t = m2t_ref[...]                  # (2*D2, 2*D2)
    for j in range(BA):
        xr = p_ref[0, j].reshape(D1, D2 * block_b)
        xi = p_ref[1, j].reshape(D1, D2 * block_b)
        x2 = jnp.concatenate([xr, xi], axis=0)          # (2*D1, D2*Bt)
        y = jnp.dot(m1, x2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        yr = y[:D1].reshape(D1, D2, block_b)
        yi = y[D1:].reshape(D1, D2, block_b)
        # second contraction: per d1 row, (Bt, 2*D2) @ (2*D2, 2*D2)
        for i in range(D1):
            z = jnp.concatenate([yr[i], yi[i]], axis=0)  # (2*D2, Bt)
            w = jnp.dot(m2t.T, z, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            o_ref[0, j, i] = w[:D2]
            o_ref[1, j, i] = w[D2:]


@functools.partial(jax.jit, static_argnames=("BA", "block_b"))
def real2x_pass(m1, m2t, p, BA=1, block_b=128):
    grid = (A // BA, pl.cdiv(B, block_b))
    return pl.pallas_call(
        functools.partial(_real2x_body, BA=BA, block_b=block_b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * D1, 2 * D1), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * D2, 2 * D2), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BA, D1, D2, block_b),
                         lambda a, b: (0, a, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BA, D1, D2, block_b),
                               lambda a, b: (0, a, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(m1, m2t, p)


def scanned(step):
    @jax.jit
    def run(psi):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, psi, None, length=K)
        return out
    return run


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "copy", "pair", "real2x"]

    U1, U2 = su(D1, 1), su(D2, 2)
    W1r, W1i = np.real(U1).astype(np.float32), np.imag(U1).astype(np.float32)
    W2r, W2i = np.real(U2).astype(np.float32), np.imag(U2).astype(np.float32)

    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 2 ** N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    psi_dev = jnp.asarray(psi)

    results = {}
    if "copy" in which:
        p5 = psi_dev.reshape(2, A, D1, D2, B)
        results["copy"], _ = timed(scanned(lambda p: copy_pass(p, 128)),
                                   p5, "copy")
    if "copy512" in which:
        p5 = psi_dev.reshape(2, A, D1, D2, B)
        results["copy512"], _ = timed(scanned(lambda p: copy_pass(p, 512)),
                                      p5, "copy512")
    if "pair" in which:
        from qbot_tpu.tpu.kernels import _pair_bt
        w1s = jnp.stack([jnp.asarray(W1r), jnp.asarray(W1i)])
        w2s = jnp.stack([jnp.asarray(W2r), jnp.asarray(W2i)])
        p5 = psi_dev.reshape(2, A, D1, D2, B)
        results["pair"], _ = timed(
            scanned(lambda p: _pair_bt(w1s, w2s, p, 128)), p5, "pair")
    if "real2x" in which:
        M1 = np.block([[W1r, -W1i], [W1i, W1r]]).astype(np.float32)
        M2 = np.block([[W2r, -W2i], [W2i, W2r]]).astype(np.float32)
        m1 = jnp.asarray(M1)
        m2t = jnp.asarray(M2.T)
        p5 = psi_dev.reshape(2, A, D1, D2, B)
        results["real2x"], _ = timed(
            scanned(lambda p: real2x_pass(m1, m2t, p, 1, 128)), p5, "real2x")

    # cross-check pair vs real2x on one pass
    if "pair" in results and "real2x" in results:
        d = float(jnp.max(jnp.abs(results["pair"] - results["real2x"])))
        print(f"pair-vs-real2x max|Δ| = {d:.2e}")
