"""Probe: selective per-window precision (f32_mix) + free-cadence renorm
on the 26q bench brickwork (VERDICT r4 #4/#8).

Rows: gates/s, final norm, max |delta| vs the f32 reference output, for
  f32 / f32_mix / f32_mix+renorm1 / bf16_3x / bf16_3x+renorm1.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import GENERAL_LAYERS, GENERAL_REPEATS, N, _brickwork
    from qbot_tpu.tpu import kernels
    from qbot_tpu.tpu.compiler import compile_circuit
    from qbot_tpu.tpu.planar import (
        make_scanned_planar_runner,
        zero_state_planar,
    )
    from qbot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    body = _brickwork(N, GENERAL_LAYERS)
    gates = body.gate_count * GENERAL_REPEATS
    psi0 = zero_state_planar(N)

    def timed(run):
        t0 = time.perf_counter()
        out = run(psi0)
        _ = float(jnp.asarray(out[0, 0]))
        return time.perf_counter() - t0, out

    rows = {}
    ref = None
    for mode, renorm in (("f32", 0), ("f32_mix", 0), ("f32_mix", 1),
                         ("bf16_3x", 0), ("bf16_3x", 1)):
        kernels.set_kernel_mode("on")
        kernels.set_dot_mode(mode)
        jax.clear_caches()
        plan = compile_circuit(body, window="auto")
        run = make_scanned_planar_runner(plan, GENERAL_REPEATS,
                                         renorm_every=renorm)
        compile_s, out = timed(run)
        elapsed = min(timed(run)[0] for _ in range(3))
        if ref is None:
            ref = out
        key = mode + (f"+renorm{renorm}" if renorm else "")
        rows[key] = {
            "gates_per_s": round(gates / elapsed, 1),
            "seconds_per_body": round(elapsed / GENERAL_REPEATS * 1e3, 3),
            "engine": plan.engine,
            "compile_s": round(compile_s, 1),
            "norm": round(float(jnp.sum(out ** 2)), 7),
            "max_delta_vs_f32": float(
                f"{float(jnp.max(jnp.abs(out - ref))):.3e}"),
        }
        print(json.dumps({key: rows[key]}), flush=True)
    kernels.set_dot_mode("f32")
    kernels.set_kernel_mode("auto")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
