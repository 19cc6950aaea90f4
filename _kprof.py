"""Micro-profile: single-window vs pair kernels at n=26."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit, PairStep, WindowStep
from qbot_tpu.tpu.planar import apply_plan_planar, zero_state_planar, make_scanned_planar_runner

n = 26
REP = 64

def timeit(circ, pair, label):
    plan = compile_circuit(circ, pair=pair)
    kinds = [type(s).__name__ for s in plan.steps]
    run = make_scanned_planar_runner(plan, REP)
    psi = zero_state_planar(n)
    out = run(psi); _ = float(jnp.asarray(out[0,0]))  # compile
    t0 = time.perf_counter(); out = run(psi); _ = float(jnp.asarray(out[0,0]))
    dt = (time.perf_counter() - t0) / REP
    print(f"{label:28s} steps={kinds} {dt*1e3:.3f} ms/rep -> {dt*1e3/len(plan.steps):.3f} ms/pass")

# H-layer single windows (4 passes)
c = Circuit(n)
for q in range(n): c.h(q)
timeit(c, False, "H-layer unpaired")
timeit(c, True,  "H-layer paired")

# only the trailing pair (12..25)
c = Circuit(n)
for q in range(12, 26): c.h(q)
timeit(c, True, "trailing pair b1")

# only the leading pair (0..11)
c = Circuit(n)
for q in range(0, 12): c.h(q)
timeit(c, True, "leading pair bt")
