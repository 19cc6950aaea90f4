"""Micro-profile of the Grover iteration's HBM passes on the real chip.

Breaks the scanned body (FlipStep oracle + ReflectStep diffusion) into its
component passes and times each under lax.scan, to locate the gap between
measured per-iteration time and the HBM speed-of-light.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit, ReflectStep, FlipStep
from qbot_tpu.tpu.planar import (
    zero_state_planar, apply_plan_planar, _apply_reflect_planar,
)

N = 26
R = 64


def timed(fn, psi):
    out = fn(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t0 = time.perf_counter()
    out = fn(psi)
    _ = float(jnp.asarray(out[0, 0]))
    return (time.perf_counter() - t0) / R * 1e3


def scanned(body):
    @jax.jit
    def run(psi):
        def step(c, _):
            return body(c), None
        psi, _ = jax.lax.scan(step, psi, None, length=R)
        return psi
    return run


def main():
    body = Circuit(N)
    body.phase_flip(12345)
    for q in range(N):
        body.h(q)
    body.phase_flip(0)
    for q in range(N):
        body.h(q)
    plan = compile_circuit(body)
    print("plan steps:", [type(s).__name__ for s in plan.steps])
    reflect = next(s for s in plan.steps if isinstance(s, ReflectStep))

    psi = zero_state_planar(N)
    sz_mb = psi.size * 4 / 2**20
    print(f"state {sz_mb:.0f} MB planar; SoL read+write pass "
          f"@819GB/s = {2*sz_mb/1024/819*1e3:.2f} ms")

    full = scanned(lambda p: apply_plan_planar(p, plan))
    print(f"full body      : {timed(full, psi):7.3f} ms/iter")

    flip = scanned(lambda p: p.at[:, 12345].multiply(-1))
    print(f"flip alone     : {timed(flip, psi):7.3f} ms/iter")

    refl = scanned(lambda p: _apply_reflect_planar(p, N, reflect))
    print(f"reflect alone  : {timed(refl, psi):7.3f} ms/iter")

    # dot pass alone: fused multiply-reduce <v|psi>
    from qbot_tpu.tpu.planar import _broadcast_product
    dims = tuple(f.shape[0] for f in reflect.factors)

    def dot_pass(p):
        vr, vi = _broadcast_product(reflect.factors, dims, p.dtype)
        pr = p[0].reshape(dims)
        pi = p[1].reshape(dims)
        cr = jnp.sum(vr * pr + vi * pi)
        ci = jnp.sum(vr * pi - vi * pr)
        return p.at[:, 0].add(jnp.stack([cr, ci]) * 1e-30)

    dotp = scanned(dot_pass)
    print(f"dot pass alone : {timed(dotp, psi):7.3f} ms/iter")

    # update pass alone (c fixed scalars)
    def upd_pass(p):
        vr, vi = _broadcast_product(reflect.factors, dims, p.dtype)
        cr = p[0, 0] * 1e-6
        ci = p[1, 0] * 1e-6
        tr = p[0].reshape(dims) - 2 * (cr * vr - ci * vi)
        ti = p[1].reshape(dims) - 2 * (cr * vi + ci * vr)
        return jnp.stack([tr.reshape(-1), ti.reshape(-1)])

    updp = scanned(upd_pass)
    print(f"update alone   : {timed(updp, psi):7.3f} ms/iter")


if __name__ == "__main__":
    main()
