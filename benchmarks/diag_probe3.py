"""Kernel compile-time probe series 3: pair kernels + D=64 left."""
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


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def timed(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, (tuple, list)) else out
                          ).reshape(-1)[0])
    t1 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, (tuple, list)) else out
                          ).reshape(-1)[0])
    t2 = time.perf_counter()
    print(f"{label}: compile {t1-t0:.1f}s, run {t2-t1:.4f}s", flush=True)


CP1 = pltpu.CompilerParams(dimension_semantics=("parallel",),
                           vmem_limit_bytes=100 * 1024 * 1024)
CP2 = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"),
                           vmem_limit_bytes=100 * 1024 * 1024)

# ---- pair_b1 (trailing pair): windows (12,7)+(19,7), A=2^12, D1=D2=128 ----
D1 = D2 = 128
A = 2**12
p = jnp.zeros((2, A, D1, D2), jnp.float32).at[0, 0, 0, 0].set(1.0)
w1 = jnp.stack([jnp.eye(D1), jnp.zeros((D1, D1))]).astype(jnp.float32)
w2 = w1


def pair_b1_pret_body(w1_ref, w2t_ref, p_ref, o_ref):
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2rt, w2it = w2t_ref[0], w2t_ref[1]
    xr, xi = p_ref[0, 0], p_ref[1, 0]
    yr = _dot(w1r, xr) - _dot(w1i, xi)
    yi = _dot(w1r, xi) + _dot(w1i, xr)
    o_ref[0, 0] = _dot(yr, w2rt) - _dot(yi, w2it)
    o_ref[1, 0] = _dot(yr, w2it) + _dot(yi, w2rt)


@jax.jit
def pair_b1_pret(w1, w2t, p):
    return pl.pallas_call(
        pair_b1_pret_body, grid=(A,),
        in_specs=[
            pl.BlockSpec((2, D1, D1), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D2, D2), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, D1, D2), lambda a: (0, a, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 1, D1, D2), lambda a: (0, a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=CP1)(w1, w2t, p)


w2t = jnp.stack([w2[0].T, w2[1].T])
timed("pair_b1 128x128 pre-T", pair_b1_pret, w1, w2t, p)

# bigger trailing-pair block: 8 A-rows per grid step
def pair_b1_blk_body(w1_ref, w2t_ref, p_ref, o_ref):
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2rt, w2it = w2t_ref[0], w2t_ref[1]
    BA = p_ref.shape[1]
    for j in range(BA):
        xr, xi = p_ref[0, j], p_ref[1, j]
        yr = _dot(w1r, xr) - _dot(w1i, xi)
        yi = _dot(w1r, xi) + _dot(w1i, xr)
        o_ref[0, j] = _dot(yr, w2rt) - _dot(yi, w2it)
        o_ref[1, j] = _dot(yr, w2it) + _dot(yi, w2rt)


@jax.jit
def pair_b1_blk(w1, w2t, p):
    BA = 8
    return pl.pallas_call(
        pair_b1_blk_body, grid=(A // BA,),
        in_specs=[
            pl.BlockSpec((2, D1, D1), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D2, D2), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BA, D1, D2), lambda a: (0, a, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, BA, D1, D2), lambda a: (0, a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=CP1)(w1, w2t, p)


timed("pair_b1 128x128 pre-T BA=8", pair_b1_blk, w1, w2t, p)

# ---- pair_bt: windows (0,5)+(5,7): A=1, D1=32, D2=128, B=2^14 ----
D1s, D2s = 32, 128
Bs = 2**14
ps = jnp.zeros((2, 1, D1s, D2s, Bs), jnp.float32).at[0, 0, 0, 0, 0].set(1.0)
w1s = jnp.stack([jnp.eye(D1s), jnp.zeros((D1s, D1s))]).astype(jnp.float32)
w2s = jnp.stack([jnp.eye(D2s), jnp.zeros((D2s, D2s))]).astype(jnp.float32)


def pair_bt_body(w1_ref, w2_ref, p_ref, o_ref, *, block_b):
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2r, w2i = w2_ref[0], w2_ref[1]
    xr = p_ref[0, 0].reshape(D1s, D2s * block_b)
    xi = p_ref[1, 0].reshape(D1s, D2s * block_b)
    yr = (_dot(w1r, xr) - _dot(w1i, xi)).reshape(D1s, D2s, block_b)
    yi = (_dot(w1r, xi) + _dot(w1i, xr)).reshape(D1s, D2s, block_b)
    for j in range(D1s):
        ar, ai = yr[j], yi[j]
        o_ref[0, 0, j] = _dot(w2r, ar) - _dot(w2i, ai)
        o_ref[1, 0, j] = _dot(w2r, ai) + _dot(w2i, ar)


def make_pair_bt(block_b):
    body = functools.partial(pair_bt_body, block_b=block_b)

    @jax.jit
    def run(w1, w2, p):
        return pl.pallas_call(
            body, grid=(1, pl.cdiv(Bs, block_b)),
            in_specs=[
                pl.BlockSpec((2, D1s, D1s), lambda a, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, D2s, D2s), lambda a, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, D1s, D2s, block_b),
                             lambda a, b: (0, a, 0, 0, b),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, 1, D1s, D2s, block_b),
                                   lambda a, b: (0, a, 0, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            compiler_params=CP2)(w1, w2, p)
    return run


timed("pair_bt 32/128 loop block_b=128", make_pair_bt(128), w1s, w2s, ps)

# two sequential single-window passes as the reference point for pairs:
# (probes whether pair fusion is worth its compile cost at all)
def left_body(w_ref, p_ref, o_ref):
    wr_, wi_ = w_ref[0], w_ref[1]
    pr, pi = p_ref[0, 0], p_ref[1, 0]
    o_ref[0, 0] = _dot(wr_, pr) - _dot(wi_, pi)
    o_ref[1, 0] = _dot(wr_, pi) + _dot(wi_, pr)


def make_left(D, B, block_b):
    @jax.jit
    def run(w, p):
        return pl.pallas_call(
            left_body, grid=(1, pl.cdiv(B, block_b)),
            in_specs=[
                pl.BlockSpec((2, D, D), lambda a, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, D, block_b), lambda a, b: (0, a, 0, b),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, 1, D, block_b),
                                   lambda a, b: (0, a, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            compiler_params=CP2)(w, p)
    return run


# D=64 windows (w=6 partitions)
D6 = 64
B6 = 2**(n - 6)
p6 = jnp.zeros((2, 1, D6, B6), jnp.float32).at[0, 0, 0, 0].set(1.0)
w6 = jnp.stack([jnp.eye(D6), jnp.zeros((D6, D6))]).astype(jnp.float32)
timed("left D=64 stacked block_b=512", make_left(D6, B6, 512), w6, p6)
timed("left D=64 stacked block_b=2048", make_left(D6, B6, 2048), w6, p6)
