"""Per-kernel compile-time probe at 26 qubits (axon TPU)."""
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
psi = zero_state_planar(n)


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t1 = time.perf_counter()
    out = fn()
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t2 = time.perf_counter()
    print(f"{label}: compile+run {t1-t0:.1f}s, run {t2-t1:.3f}s", flush=True)


def wmat(w):
    m = np.eye(2**w, dtype=np.float32)
    return jnp.asarray(m), jnp.asarray(np.zeros_like(m))


# window (19,7): B=1, right-multiply
Wr, Wi = wmat(7)
timed("right_mult D=128 (win 19,7)",
      lambda: kernels.planar_window_apply(psi, n, 19, 7, Wr, Wi))

# window (5,7): B=2^14, left-multiply
timed("left_mult D=128 B=2^14 (win 5,7)",
      lambda: kernels.planar_window_apply(psi, n, 5, 7, Wr, Wi))

# window (12,7): B=2^7 left-multiply
timed("left_mult D=128 B=128 (win 12,7)",
      lambda: kernels.planar_window_apply(psi, n, 12, 7, Wr, Wi))

# window (0,5): B=2^21 left-multiply
W5r, W5i = wmat(5)
timed("left_mult D=32 B=2^21 (win 0,5)",
      lambda: kernels.planar_window_apply(psi, n, 0, 5, W5r, W5i))

# pair (0,5)+(5,7): _pair_bt D1=32 D2=128 B=2^14
timed("pair_bt D1=32 D2=128 B=2^14",
      lambda: kernels.planar_pair_window_apply(psi, n, 0, 5, 5, 7,
                                               W5r, W5i, Wr, Wi))

# pair (12,7)+(19,7): _pair_b1 D1=128 D2=128
timed("pair_b1 D1=128 D2=128",
      lambda: kernels.planar_pair_window_apply(psi, n, 12, 7, 19, 7,
                                               Wr, Wi, Wr, Wi))
