"""Per-step-type runtime attribution at 26 qubits on the real TPU.

Scans a body of ONE step type and reports ms/pass + effective HBM GB/s
for: window (7q), pair (7+7), diag (cross-window CZ), with Pallas on/off.
Usage: python benchmarks/diag_steps.py <case> [...]
cases: window-on window-off pair-on pair-off diag mixed-on mixed-off
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qbot_tpu.tpu import kernels
from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import make_scanned_planar_runner, zero_state_planar

N = 26
REPEATS = 64


def random_su2(rng):
    z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    q, r = np.linalg.qr(z)
    return q * (np.conj(r.diagonal() / np.abs(r.diagonal())))


def body_for(case: str) -> Circuit:
    rng = np.random.default_rng(0)
    c = Circuit(N)
    if case.startswith("window"):
        # gates confined to the LAST window (19..25) → one 128x128 window
        for q in range(19, 26):
            c.gate(random_su2(rng), [q])
        # plus the middle window (12..18) so both kernel variants appear
    elif case.startswith("pair"):
        for q in range(12, 26):
            c.gate(random_su2(rng), [q])   # windows (12,7)+(19,7) → pair
    elif case.startswith("diag"):
        CZ = np.diag([1, 1, 1, -1]).astype(complex)
        c.gate(CZ, [11, 12])               # crosses the 5|12 boundary
    elif case.startswith("mixed"):
        for q in range(N):
            c.gate(random_su2(rng), [q])
        CZ = np.diag([1, 1, 1, -1]).astype(complex)
        for q in range(0, N - 1, 2):
            c.gate(CZ, [q, q + 1])
    return c


def run_case(case: str):
    kernels.set_kernel_mode("off" if case.endswith("-off") else "on")
    body = body_for(case)
    plan = compile_circuit(body)
    kinds = [type(s).__name__ for s in plan.steps]
    run = make_scanned_planar_runner(plan, REPEATS)
    psi = zero_state_planar(N)
    t0 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    t_c = time.perf_counter() - t0
    best = min(timeit(run, psi) for _ in range(3))
    per_pass = best / (REPEATS * plan.num_passes)
    gb = 2 * 2 * (2**N) * 4 / 1e9
    print(f"{case:12s} steps={ {k: kinds.count(k) for k in set(kinds)} } "
          f"passes={plan.num_passes} compile={t_c:6.1f}s "
          f"ms/pass={per_pass * 1e3:7.3f} eff-BW={gb / per_pass:7.1f} GB/s",
          flush=True)


def timeit(run, psi):
    t0 = time.perf_counter()
    out = run(psi)
    _ = float(jnp.asarray(out[0, 0]))
    return time.perf_counter() - t0


if __name__ == "__main__":
    for case in sys.argv[1:]:
        run_case(case)
    kernels.set_kernel_mode("auto")
