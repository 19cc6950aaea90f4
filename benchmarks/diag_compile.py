"""Stage-by-stage compile-time diagnosis for the 26q Grover bench."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
d = jax.devices()
print(f"devices: {d} (init {time.perf_counter()-t0:.1f}s)", flush=True)

# stage 0: trivial jit
t0 = time.perf_counter()
f = jax.jit(lambda x: x * 2 + 1)
_ = f(jnp.ones((8, 128))).block_until_ready()
print(f"trivial jit: {time.perf_counter()-t0:.1f}s", flush=True)

from qbot_tpu.tpu.circuit import Circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import (
    make_scanned_planar_runner, make_planar_runner, zero_state_planar,
    apply_plan_planar)

n = 26
init = Circuit(n)
for q in range(n):
    init.h(q)
body = Circuit(n)
body.phase_flip(12345)
for q in range(n):
    body.h(q)
body.phase_flip(0)
for q in range(n):
    body.h(q)
body_plan = compile_circuit(body)
init_plan = compile_circuit(init)
psi0 = zero_state_planar(n)

# stage 1: init plan only (window/pair kernels, 4 steps)
t0 = time.perf_counter()
run_init = make_planar_runner(init_plan)
out = run_init(psi0)
_ = float(jnp.asarray(out[0, 0]))
print(f"init plan compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

# stage 2: scanned reflect, length 1, no init
t0 = time.perf_counter()
r1 = make_scanned_planar_runner(body_plan, 1, init_plan=None)
out = r1(psi0)
_ = float(jnp.asarray(out[0, 0]))
print(f"scan len=1 no-init: {time.perf_counter()-t0:.1f}s", flush=True)

# stage 3: scanned reflect, length 512, no init
t0 = time.perf_counter()
r512 = make_scanned_planar_runner(body_plan, 512, init_plan=None)
out = r512(psi0)
_ = float(jnp.asarray(out[0, 0]))
print(f"scan len=512 no-init: {time.perf_counter()-t0:.1f}s", flush=True)

# stage 4: full bench config (with init)
t0 = time.perf_counter()
rfull = make_scanned_planar_runner(body_plan, 512, init_plan=init_plan)
out = rfull(psi0)
_ = float(jnp.asarray(out[0, 0]))
print(f"scan len=512 with-init: {time.perf_counter()-t0:.1f}s", flush=True)
