"""Probe: where do the ~24 s of the SCALING_r04 anchor wall go?

Hypothesis (round 5): host<->device transfers of the 1 GB initial
ensemble through the axon tunnel dominate — the collapse math itself is
~0.07 s of HBM traffic.  Measures, on the real chip:

1. host->device device_put of the (8, 2, 2^24) f32 ensemble (1 GB)
2. device->host np.asarray of one particle (128 MB)
3. on-device construction of the same ensemble (jitted zeros+set)
4. 20 tiny dispatches (fixed per-call tunnel cost)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 24
B = 8


def t(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        # force a scalar fetch: block_until_ready does not fully sync axon
        _ = float(jnp.asarray(out).ravel()[0]) if hasattr(out, "ravel") \
            else None
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f} s")
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    host = np.zeros((B, 2, 2 ** N), np.float32)
    host[:, 0, 0] = 1.0

    t("h2d device_put 1GB", lambda: jax.device_put(host, dev))

    on_dev = jax.device_put(host, dev)
    jax.block_until_ready(on_dev)

    t0 = time.perf_counter()
    _ = np.asarray(on_dev[0])
    print(f"d2h np.asarray 128MB: {time.perf_counter() - t0:.3f} s")

    @jax.jit
    def build():
        psi = jnp.zeros((B, 2, 2 ** N), jnp.float32)
        return psi.at[:, 0, 0].set(1.0)

    t("on-device build 1GB (jit, incl compile 1st)", build, reps=3)

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    _ = float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(20):
        x = f(x)
    _ = float(x[0])
    print(f"20 tiny dispatches: {time.perf_counter() - t0:.3f} s "
          f"({(time.perf_counter() - t0) / 20 * 1e3:.1f} ms each)")


if __name__ == "__main__":
    main()
