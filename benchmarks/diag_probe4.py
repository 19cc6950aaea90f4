"""Bisect: why is planar_window_apply slow to compile when the bare
pallas_call with identical geometry is fast?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.planar import zero_state_planar

n = 26
D = 128
A = 2**(n - 7)
psi = zero_state_planar(n)
Wr = jnp.asarray(np.eye(D, dtype=np.float32))
Wi = jnp.zeros((D, D), jnp.float32)
wt = jnp.stack([Wr.T, Wi.T])
p3 = psi.reshape(2, A, D)


def timed(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t1 = time.perf_counter()
    print(f"{label}: compile+run {t1-t0:.1f}s", flush=True)


# 1. the bare jitted kernel, precomputed wt (probe2's fast case)
timed("bare _right_multiply", kernels._right_multiply, wt, p3, 4096, ())

# 2. planar_window_apply eager (diag_kernels' slow case) — same geometry,
#    new dummy W values so nothing is cached
W2r = jnp.asarray(np.diag(np.linspace(1.0, 2.0, D)).astype(np.float32))
timed("planar_window_apply eager",
      lambda: kernels.planar_window_apply(psi, n, 19, 7, W2r, Wi))

# 3. under an outer jit
W3r = jnp.asarray(np.diag(np.linspace(2.0, 3.0, D)).astype(np.float32))


@jax.jit
def outer(psi, Wr, Wi):
    return kernels.planar_window_apply(psi, n, 19, 7, Wr, Wi)


timed("planar_window_apply jit", outer, psi, W3r, Wi)
