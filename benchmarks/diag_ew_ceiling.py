"""Probe: is the Grover headline at the chip's practical elementwise
ceiling? (VERDICT r4 weak #6: the ~620 GB/s Grover pass has been flat
for four rounds with the last 24% vs the 819 GB/s datasheet neither
claimed as a ceiling with evidence nor probed.)

Measures, on the same (2, F, S, L) carrier the Grover body uses:
  * pure copy        (x + 0)                — the HBM RW floor
  * scale            (x * c)                — one VPU op per element
  * scale + reduce   (x * c, sum epilogue)  — the reflect pass shape
against the Grover body itself.  If copy == Grover pass, the headline
IS the elementwise ceiling of this part + compiler generation.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qbot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    N = 26
    K = 64
    shape = (2, 2 ** (N - 10), 8, 128)
    bytes_rw = 2 * 2 * (2 ** N) * 4       # read + write, planar f32

    x = jnp.ones(shape, jnp.float32) * 0.001

    def timed(fn, label):
        r = jax.jit(fn)
        t0 = time.perf_counter()
        out = r(x)
        _ = float(jnp.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        out = r(x)
        _ = float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / K
        print(f"{label}: {dt * 1e3:.3f} ms/pass = "
              f"{bytes_rw / dt / 1e9:.0f} GB/s")
        return dt

    def scan_body(body):
        def fn(x):
            def step(c, _):
                return body(c), None
            y, _ = jax.lax.scan(step, x, None, length=K)
            return y
        return fn

    timed(scan_body(lambda c: c + jnp.float32(1e-9)), "copy+eps  ")
    timed(scan_body(lambda c: c * jnp.float32(1.0000001)), "scale     ")

    def reflect_like(c):
        s = jnp.sum(c)                    # fused reduce epilogue
        return c * jnp.float32(0.9999999) + s * jnp.float32(1e-12)

    timed(scan_body(reflect_like), "scale+sum ")


if __name__ == "__main__":
    main()


def main2():
    """Same probes on the reflect runner's ACTUAL carry layout: two
    separate flat (2^n,) planes (no leading size-2 axis)."""
    import jax
    import jax.numpy as jnp

    N = 26
    K = 64
    bytes_rw = 2 * 2 * (2 ** N) * 4
    a = jnp.ones((2 ** N,), jnp.float32) * 0.001
    b = jnp.ones((2 ** N,), jnp.float32) * 0.002

    import time

    def timed(fn, label):
        r = jax.jit(fn)
        out = r(a, b)
        _ = float(jnp.asarray(out[0]).ravel()[0])
        t0 = time.perf_counter()
        out = r(a, b)
        _ = float(jnp.asarray(out[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / K
        print(f"{label}: {dt * 1e3:.3f} ms/pass = "
              f"{bytes_rw / dt / 1e9:.0f} GB/s")

    def scan2(body):
        def fn(x, y):
            def step(c, _):
                return body(*c), None
            (x, y), _ = jax.lax.scan(step, (x, y), None, length=K)
            return x, y
        return fn

    timed(scan2(lambda x, y: (x * jnp.float32(0.999999),
                              y * jnp.float32(0.999999))),
          "two-plane scale    ")

    def reflect_like(x, y):
        s1 = jnp.sum(x)
        s2 = jnp.sum(y)
        return (x * jnp.float32(0.9999) + s1 * jnp.float32(1e-12),
                y * jnp.float32(0.9999) + s2 * jnp.float32(1e-12))

    timed(scan2(reflect_like), "two-plane scale+sum")


if __name__ == "__main__":
    main2()
