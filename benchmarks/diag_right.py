"""Probe _right_multiply compile-time variants at 26 qubits."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

n = 26
D = 128
A = 2**(n - 7)
psi = jnp.zeros((2, A, D), jnp.float32).at[0, 0, 0].set(1.0)
wr = jnp.asarray(np.eye(D, dtype=np.float32))
wi = jnp.zeros((D, D), jnp.float32)
w = jnp.stack([wr, wi])
wt = jnp.stack([wr.T, wi.T])


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def timed(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t1 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t2 = time.perf_counter()
    print(f"{label}: compile {t1-t0:.1f}s, run {t2-t1:.4f}s", flush=True)


def body_transpose(w_ref, p_ref, o_ref):
    wr_t = w_ref[0].T
    wi_t = w_ref[1].T
    pr, pi = p_ref[0], p_ref[1]
    o_ref[0] = _dot(pr, wr_t) - _dot(pi, wi_t)
    o_ref[1] = _dot(pi, wr_t) + _dot(pr, wi_t)


def body_pret(wt_ref, p_ref, o_ref):
    wr_t = wt_ref[0]
    wi_t = wt_ref[1]
    pr, pi = p_ref[0], p_ref[1]
    o_ref[0] = _dot(pr, wr_t) - _dot(pi, wi_t)
    o_ref[1] = _dot(pi, wr_t) + _dot(pr, wi_t)


def make(body, block_a):
    @jax.jit
    def run(w, p):
        grid = (pl.cdiv(A, block_a),)
        return pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((2, D, D), lambda a: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w, p)
    return run

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "a"):
    timed("pre-transposed W, block_a=4096", make(body_pret, 4096), wt, psi)
if which in ("all", "b"):
    timed("in-kernel T, block_a=512", make(body_transpose, 512), w, psi)
if which in ("all", "c"):
    timed("pre-transposed W, block_a=512", make(body_pret, 512), wt, psi)
if which in ("all", "d"):
    timed("in-kernel T, block_a=4096 (baseline)", make(body_transpose, 4096),
          w, psi)
