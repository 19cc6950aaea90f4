"""Kernel compile-time probe series 2 (run alone on the chip)."""
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
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out
                          ).reshape(-1)[0])
    t1 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out
                          ).reshape(-1)[0])
    t2 = time.perf_counter()
    print(f"{label}: compile {t1-t0:.1f}s, run {t2-t1:.4f}s", flush=True)


CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                          vmem_limit_bytes=100 * 1024 * 1024)
CP2 = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"),
                           vmem_limit_bytes=100 * 1024 * 1024)

# ---- right-multiply variants (win 19,7: A=2^19, D=128, B=1) ----
D = 128
A = 2**(n - 7)
psi3 = jnp.zeros((2, A, D), jnp.float32).at[0, 0, 0].set(1.0)
wr = jnp.asarray(np.eye(D, dtype=np.float32))
wi = jnp.zeros((D, D), jnp.float32)
w = jnp.stack([wr, wi])
wt = jnp.stack([wr.T, wi.T])


def right_pret_body(wt_ref, p_ref, o_ref):
    wr_t, wi_t = wt_ref[0], wt_ref[1]
    pr, pi = p_ref[0], p_ref[1]
    o_ref[0] = _dot(pr, wr_t) - _dot(pi, wi_t)
    o_ref[1] = _dot(pi, wr_t) + _dot(pr, wi_t)


def make_right(body, block_a):
    @jax.jit
    def run(w, p):
        return pl.pallas_call(
            body, grid=(pl.cdiv(A, block_a),),
            in_specs=[
                pl.BlockSpec((2, D, D), lambda a: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            compiler_params=CP)(w, p)
    return run


# split planar components: no leading (2,) axis anywhere
def right_split_body(wrt_ref, wit_ref, pr_ref, pi_ref, or_ref, oi_ref):
    wr_t, wi_t = wrt_ref[...], wit_ref[...]
    pr, pi = pr_ref[...], pi_ref[...]
    or_ref[...] = _dot(pr, wr_t) - _dot(pi, wi_t)
    oi_ref[...] = _dot(pi, wr_t) + _dot(pr, wi_t)


def make_right_split(block_a):
    @jax.jit
    def run(wrt, wit, pr, pi):
        spec_w = pl.BlockSpec((D, D), lambda a: (0, 0),
                              memory_space=pltpu.VMEM)
        spec_p = pl.BlockSpec((block_a, D), lambda a: (a, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            right_split_body, grid=(pl.cdiv(A, block_a),),
            in_specs=[spec_w, spec_w, spec_p, spec_p],
            out_specs=[spec_p, spec_p],
            out_shape=[jax.ShapeDtypeStruct(pr.shape, pr.dtype)] * 2,
            compiler_params=CP)(wrt, wit, pr, pi)
    return run


timed("right split-planar block_a=4096", make_right_split(4096),
      wr.T, wi.T, psi3[0], psi3[1])
timed("right pre-T stacked block_a=4096", make_right(right_pret_body, 4096),
      wt, psi3)
timed("right split-planar block_a=1024", make_right_split(1024),
      wr.T, wi.T, psi3[0], psi3[1])

# ---- left D=32 variants (win 0,5: A=1, D=32, B=2^21) ----
D5 = 32
B5 = 2**(n - 5)
p4 = jnp.zeros((2, 1, D5, B5), jnp.float32).at[0, 0, 0, 0].set(1.0)
w5r = jnp.asarray(np.eye(D5, dtype=np.float32))
w5i = jnp.zeros((D5, D5), jnp.float32)
w5 = jnp.stack([w5r, w5i])


def left_body(w_ref, p_ref, o_ref):
    wr_, wi_ = w_ref[0], w_ref[1]
    pr, pi = p_ref[0, 0], p_ref[1, 0]
    o_ref[0, 0] = _dot(wr_, pr) - _dot(wi_, pi)
    o_ref[1, 0] = _dot(wr_, pi) + _dot(wi_, pr)


def make_left(block_b):
    @jax.jit
    def run(w, p):
        return pl.pallas_call(
            left_body, grid=(1, pl.cdiv(B5, block_b)),
            in_specs=[
                pl.BlockSpec((2, D5, D5), lambda a, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, D5, block_b), lambda a, b: (0, a, 0, b),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, 1, D5, block_b),
                                   lambda a, b: (0, a, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            compiler_params=CP2)(w, p)
    return run


def left_split_body(wr_ref, wi_ref, pr_ref, pi_ref, or_ref, oi_ref):
    wr_, wi_ = wr_ref[...], wi_ref[...]
    pr, pi = pr_ref[...], pi_ref[...]
    or_ref[...] = _dot(wr_, pr) - _dot(wi_, pi)
    oi_ref[...] = _dot(wr_, pi) + _dot(wi_, pr)


def make_left_split(block_b):
    @jax.jit
    def run(wr_, wi_, pr, pi):
        spec_w = pl.BlockSpec((D5, D5), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
        spec_p = pl.BlockSpec((D5, block_b), lambda b: (0, b),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            left_split_body, grid=(pl.cdiv(B5, block_b),),
            in_specs=[spec_w, spec_w, spec_p, spec_p],
            out_specs=[spec_p, spec_p],
            out_shape=[jax.ShapeDtypeStruct(pr.shape, pr.dtype)] * 2,
            compiler_params=CP)(wr_, wi_, pr, pi)
    return run


pr5 = p4[0, 0]
pi5 = p4[1, 0]
timed("left D=32 split-planar block_b=2048", make_left_split(2048),
      w5r, w5i, pr5, pi5)
timed("left D=32 stacked block_b=512", make_left(512), w5, p4)
timed("left D=32 split-planar block_b=512", make_left_split(512),
      w5r, w5i, pr5, pi5)
