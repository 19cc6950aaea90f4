"""Probe: raw Pallas streaming bandwidth on this stack.

* c1flat — ONE flat f32 array, contiguous chunk tiles: the purest DMA
           in+out pipeline Pallas can express.
* c2flat — TWO flat arrays in / two out (split planar planes).
* cstack — (2, 2^26) stacked planar copy with (2, chunk) tiles (the
           production state layout).
* cxla   — XLA elementwise y = x * 1.0000001 on (2, 2^26) (reference).

Chunk sweep via argv: default 1 MB lanes-chunks.

Usage: PYTHONPATH=... python benchmarks/diag_pallasbw.py [variants]
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
K = 16
TOT = 2 ** N
CHUNK = 2 ** 18        # 1 MB of f32 per tile (per array)
ROWS = 2 ** 11         # view flat as (2^15, 2^11) rows for 2D tiles
COLS = TOT // ROWS


def _c1_body(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@jax.jit
def c1flat(x):
    g = TOT // ROWS // (CHUNK // ROWS)
    bs = CHUNK // ROWS
    return pl.pallas_call(
        _c1_body,
        grid=(g,),
        in_specs=[pl.BlockSpec((bs, ROWS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, ROWS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _c2_body(a_ref, b_ref, oa_ref, ob_ref):
    oa_ref[...] = a_ref[...]
    ob_ref[...] = b_ref[...]


@jax.jit
def c2flat(a, b):
    g = TOT // ROWS // (CHUNK // ROWS)
    bs = CHUNK // ROWS
    spec = pl.BlockSpec((bs, ROWS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _c2_body,
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)


def _cs_body(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@jax.jit
def cstack(x):
    g = TOT // ROWS // (CHUNK // ROWS)
    bs = CHUNK // ROWS
    spec = pl.BlockSpec((2, bs, ROWS), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _cs_body,
        grid=(g,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def timed(run, args, label, nbytes):
    t0 = time.perf_counter()
    out = run(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / K
    print(f"{label:8s} compile={t_compile:6.1f}s pass={per*1e3:7.3f}ms "
          f"eff-BW={nbytes / per / 1e9:6.1f} GB/s", flush=True)


def scan_one(fn):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out
    return run


def scan_two(fn):
    @jax.jit
    def run(a, b):
        def body(c, _):
            return tuple(fn(*c)), None
        out, _ = jax.lax.scan(body, (a, b), None, length=K)
        return out
    return run


if __name__ == "__main__":
    enable_compile_cache()
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "c1flat", "c2flat", "cstack", "cxla"]
    rng = np.random.default_rng(0)
    full = 2 * TOT * 4      # planar state bytes
    if "c1flat" in which:
        x = jnp.asarray(rng.normal(size=(TOT // ROWS, ROWS))
                        .astype(np.float32))
        timed(scan_one(c1flat), (x,), "c1flat", 2 * TOT * 4)
    if "c2flat" in which:
        a = jnp.asarray(rng.normal(size=(TOT // ROWS, ROWS))
                        .astype(np.float32))
        b = jnp.asarray(rng.normal(size=(TOT // ROWS, ROWS))
                        .astype(np.float32))
        timed(scan_two(c2flat), (a, b), "c2flat", 2 * full)
    if "cstack" in which:
        x = jnp.asarray(rng.normal(size=(2, TOT // ROWS, ROWS))
                        .astype(np.float32))
        timed(scan_one(cstack), (x,), "cstack", 2 * full)
    if "cxla" in which:
        x = jnp.asarray(rng.normal(size=(2, TOT // ROWS, ROWS))
                        .astype(np.float32))

        @jax.jit
        def xmul(v):
            return v * np.float32(1.0000001)
        timed(scan_one(xmul), (x,), "cxla", 2 * full)
