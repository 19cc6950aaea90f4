"""Probe: where does the SMC measure executor's device time go?

At the 24q anchor the collapse bucket is ~0.15 s/event for ~3 passes
over the ensemble (expected ~10-20 ms at engine bandwidth).  Times the
executor's stages separately at B particles x 24 qubits, mesh 1x1.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qbot_tpu.tpu.sharded_ensemble import (
        EnsembleMesh,
        init_product_sharded_ensemble,
        measure_sample_sharded,
    )
    from qbot_tpu.tpu.sharding import make_mesh
    from qbot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n = 24
    B = 24
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    emesh = EnsembleMesh(mesh)
    kets = [np.array([1.0, 0.0])] * n
    ens = init_product_sharded_ensemble(kets, emesh, B=B)
    key = jax.random.PRNGKey(0)
    GB = B * 2 * 2 ** n * 4 / 1e9

    def sync(e):
        _ = float(np.asarray(e.psi[(0,) * e.psi.ndim]))

    def timed(label, fn, reps=3):
        fn()  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best * 1e3:.1f} ms  "
              f"({GB / best:.0f} GB/s per ens-pass)")
        return best

    # full executor
    def full():
        e2, dist = measure_sample_sharded(key, ens, n, [0], emesh)
        sync(e2)

    timed("measure_sample_sharded [0]   ", full)

    def full2():
        e2, dist = measure_sample_sharded(key, ens, n, [1, 2], emesh)
        sync(e2)

    timed("measure_sample_sharded [1,2] ", full2)

    # stage A: probabilities only (mask-factor einsum chain)
    from qbot_tpu.inference.ensemble_exec import (
        _mask_factor_rows,
        _probs_by_reduce,
        _select_mask,
    )

    F, S, L = 2 ** (n - 10), 8, 128

    @jax.jit
    def probs_only(psi):
        return jax.vmap(lambda s: _probs_by_reduce(s, n, [0]))(psi)

    psi5 = ens.psi.reshape(B, 2, F, S, L)

    @jax.jit
    def probs_only5(psi):
        p = psi.reshape(B, 2, -1)
        return jax.vmap(lambda s: _probs_by_reduce(s, n, [0]))(p)

    def pa():
        _ = np.asarray(probs_only(ens.psi))

    def pa5():
        _ = np.asarray(probs_only5(psi5))

    timed("probs only (flat boundary)   ", pa)
    timed("probs only (5-D boundary)    ", pa5)

    # stage B: mask-select collapse only
    mrows = _mask_factor_rows(n, [0])

    @jax.jit
    def collapse_only(psi, outcomes, inv):
        def c(s, o, iv):
            m = _select_mask(mrows, n, o)
            return s.reshape(2, F, S, L) * (m * iv)
        return jax.vmap(c)(psi.reshape(B, 2, -1), outcomes, inv)

    outc = jnp.zeros((B,), jnp.int32)
    invv = jnp.ones((B,), jnp.float32)

    def cb():
        _ = collapse_only(psi5, outc, invv)
        _ = float(np.asarray(_[0, 0, 0, 0, 0]))

    timed("collapse mask multiply (5-D) ", cb)


if __name__ == "__main__":
    main()
