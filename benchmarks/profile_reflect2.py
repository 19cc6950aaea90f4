"""Formulation shootout for the reflection passes on the real chip."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit, ReflectStep
from qbot_tpu.tpu.planar import zero_state_planar

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
    reflect = next(s for s in plan.steps if isinstance(s, ReflectStep))

    # split factors into head (all but last) and tail (last)
    head = 1.0 + 0j
    for f in reflect.factors[:-1]:
        head = np.kron(head, np.asarray(f, np.complex128))
    tail = np.asarray(reflect.factors[-1], np.complex128)
    H, T = head.shape[0], tail.shape[0]
    Ar = jnp.asarray(head.real.astype(np.float32))
    Ai = jnp.asarray(head.imag.astype(np.float32))
    Br = jnp.asarray(tail.real.astype(np.float32))
    Bi = jnp.asarray(tail.imag.astype(np.float32))
    print(f"head {H} tail {T}")

    psi = zero_state_planar(N)

    # update as real rank-1: s = c*(A x B); Q = f(c, B) small
    def upd_rank1(p):
        cr = p[0, 0] * 1e-6
        ci = p[1, 0] * 1e-6
        Qr = cr * Br - ci * Bi
        Qi = cr * Bi + ci * Br
        pr = p[0].reshape(H, T)
        pi = p[1].reshape(H, T)
        sr = Ar[:, None] * Qr[None, :] - Ai[:, None] * Qi[None, :]
        si = Ar[:, None] * Qi[None, :] + Ai[:, None] * Qr[None, :]
        return jnp.stack([(pr - 2 * sr).reshape(-1),
                          (pi - 2 * si).reshape(-1)])

    print(f"update rank1   : {timed(scanned(upd_rank1), psi):7.3f} ms/iter")

    # dot as matvec over tail then tiny head contraction
    def dot_mv(p):
        pr = p[0].reshape(H, T)
        pi = p[1].reshape(H, T)
        BB = jnp.stack([Br, Bi], axis=1)            # (T, 2)
        ur = jnp.dot(pr, BB, precision=jax.lax.Precision.HIGHEST)  # (H, 2)
        ui = jnp.dot(pi, BB, precision=jax.lax.Precision.HIGHEST)
        # c = sum_h conj(A_h) * (ur[h,0]-i... ) combine:
        # conj(v) psi = (Ar - iAi)(Br - iBi)(pr + ipi)
        cr = (Ar @ ur[:, 0] + Ai @ ui[:, 0]
              + Ar @ ui[:, 1] - Ai @ ur[:, 1])
        ci = (Ar @ ui[:, 0] - Ai @ ur[:, 0]
              - Ar @ ur[:, 1] - Ai @ ui[:, 1])
        return p.at[:, 0].add(jnp.stack([cr, ci]) * 1e-30)

    print(f"dot matvec     : {timed(scanned(dot_mv), psi):7.3f} ms/iter")

    # dot as multiply-reduce with rank-1 v
    def dot_r1(p):
        pr = p[0].reshape(H, T)
        pi = p[1].reshape(H, T)
        vr = Ar[:, None] * Br[None, :] - Ai[:, None] * Bi[None, :]
        vi = Ar[:, None] * Bi[None, :] + Ai[:, None] * Br[None, :]
        cr = jnp.sum(vr * pr + vi * pi)
        ci = jnp.sum(vr * pi - vi * pr)
        return p.at[:, 0].add(jnp.stack([cr, ci]) * 1e-30)

    print(f"dot mulreduce  : {timed(scanned(dot_r1), psi):7.3f} ms/iter")

    # fused: update with carried c + dot for next c in one body
    def fused_body(carry):
        p, cr, ci = carry
        Qr = cr * Br - ci * Bi
        Qi = cr * Bi + ci * Br
        pr = p[0].reshape(H, T)
        pi = p[1].reshape(H, T)
        outr = pr - 2 * (Ar[:, None] * Qr[None, :] - Ai[:, None] * Qi[None, :])
        outi = pi - 2 * (Ar[:, None] * Qi[None, :] + Ai[:, None] * Qr[None, :])
        vr = Ar[:, None] * Br[None, :] - Ai[:, None] * Bi[None, :]
        vi = Ar[:, None] * Bi[None, :] + Ai[:, None] * Br[None, :]
        ncr = jnp.sum(vr * outr + vi * outi)
        nci = jnp.sum(vr * outi - vi * outr)
        out = jnp.stack([outr.reshape(-1), outi.reshape(-1)])
        return out, ncr, nci

    @jax.jit
    def fused(psi):
        def step(c, _):
            return fused_body(c), None
        (p, cr, ci), _ = jax.lax.scan(step, (psi, jnp.float32(0.01),
                                             jnp.float32(0.0)),
                                      None, length=R)
        return p

    print(f"fused upd+dot  : {timed(fused, psi):7.3f} ms/iter")


if __name__ == "__main__":
    main()
