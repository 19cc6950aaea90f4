"""Worker process for the multi-host test (tests/test_distributed.py).

Usage: python _distributed_worker.py <coordinator> <num_procs> <proc_id>

Joins a jax.distributed CPU cluster (2 emulated devices per process),
builds the DCN-aware multihost mesh, and runs one sharded HMC training
step (chains on the cross-host 'particles' axis, amplitudes on 'qubits')
plus an explicit cross-host psum.  Prints one line:
``OK <psum> <mean_theta>``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qbot_tpu.tpu.distributed import (
    host_local_batch,
    initialize_multihost,
    make_multihost_mesh,
)

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs

    mesh = make_multihost_mesh(particles_per_host=1)
    assert dict(mesh.shape) == {"particles": num_procs, "qubits": 2}

    # explicit cross-host collective: psum over both mesh axes
    def count(x):
        return jax.lax.psum(x, ("particles", "qubits"))

    total = jax.jit(_shard_map(count, mesh=mesh, in_specs=P(),
                               out_specs=P()))(jnp.ones(()))
    psum_val = float(np.asarray(jax.device_get(total)))

    # one HMC step: chains sharded over the cross-host particle axis
    from qbot_tpu.tpu.circuit import parameterized_layers
    from qbot_tpu.tpu.compiler import compile_circuit
    from qbot_tpu.tpu.planar import apply_plan_planar, zero_state_planar

    n, depth = 4, 1
    chains = 2 * host_local_batch(2 * num_procs)   # global chains
    circ = parameterized_layers(n, depth)
    plan = compile_circuit(circ)
    dim = circ.num_params
    counts = jnp.zeros(2**n).at[0].set(8.0)
    chain_sharding = NamedSharding(mesh, P("particles", None))

    def batched_log_prob(thetas):
        psis = jax.vmap(
            lambda t: apply_plan_planar(zero_state_planar(n), plan, t)
        )(thetas)
        probs = psis[:, 0, :] ** 2 + psis[:, 1, :] ** 2
        loglik = jnp.sum(counts * jnp.log(jnp.clip(probs, 1e-12, 1.0)),
                         axis=-1)
        return loglik - 0.5 * jnp.sum(thetas**2, axis=-1) / 100.0

    @jax.jit
    def train_step(key, thetas):
        def total(th):
            return jnp.sum(batched_log_prob(th))

        grad = jax.grad(total)(thetas)
        p0 = jax.random.normal(key, thetas.shape, thetas.dtype)
        eps = 0.01
        q, p, g = thetas, p0, grad
        for _ in range(2):
            p = p + 0.5 * eps * g
            q = q + eps * p
            g = jax.grad(total)(q)
            p = p + 0.5 * eps * g
        lp0 = batched_log_prob(thetas) - 0.5 * jnp.sum(p0**2, axis=-1)
        lp1 = batched_log_prob(q) - 0.5 * jnp.sum(p**2, axis=-1)
        accept = lp1 > lp0          # deterministic MH for the test
        new = jnp.where(accept[:, None], q, thetas)
        return jax.lax.with_sharding_constraint(new, chain_sharding)

    @jax.jit
    def init_thetas():
        t = jnp.linspace(0.1, 1.0, chains * dim).reshape(chains, dim)
        return jax.lax.with_sharding_constraint(t, chain_sharding)

    out = train_step(jax.random.PRNGKey(0), init_thetas())
    # global mean across hosts: a cross-DCN reduction of the result
    mean = jnp.mean(out)
    mean_val = float(np.asarray(jax.device_get(mean)))
    assert np.isfinite(mean_val)

    # --- a sharded circuit whose QUBIT axis spans both hosts -------------
    # all 4 devices on 'qubits': the all_to_all qubit reshards and the
    # probability psums cross the process (DCN) boundary
    from qbot_tpu.tpu.circuit import Circuit
    from qbot_tpu.tpu.planar import (
        apply_plan_planar,
        planar_probs,
        zero_state_planar as zsp,
    )
    from qbot_tpu.tpu.sharded import (
        compile_sharded,
        make_sharded_planar_runner,
        sharded_probs_fn,
        sharded_zero_state,
    )
    from qbot_tpu.tpu.sharding import make_mesh

    gn, k = 6, 2
    qmesh = make_mesh((1, 4))
    circ = Circuit(gn)
    for q in range(gn):
        circ.h(q)
    circ.cx(0, 5)                       # crosses the shard boundary
    circ.cx(2, 3)
    circ.h(0)
    splan = compile_sharded(circ, k)
    runner = make_sharded_planar_runner(splan, qmesh)
    psi = runner(sharded_zero_state(gn, qmesh))
    probs = np.asarray(jax.device_get(
        sharded_probs_fn(splan, qmesh, targets=[0, 5])(psi)))
    # single-host oracle: the same circuit on the local planar executor
    want = np.asarray(planar_probs(
        apply_plan_planar(zsp(gn), compile_circuit(circ)), [0, 5], gn))
    assert np.allclose(probs, want, atol=1e-5), (probs, want)

    # --- checkpoint round-trip across processes --------------------------
    ckpt_ok = 1
    if len(sys.argv) > 4 and sys.argv[4]:
        from qbot_tpu.utils.checkpoint import make_checkpoint_manager

        mgr = make_checkpoint_manager(sys.argv[4], max_to_keep=1)
        mgr.save(1, {"psi": psi}, {"qubits": gn})
        if hasattr(mgr, "wait"):
            mgr.wait()
        arrays, meta = mgr.restore(1)
        assert int(meta["qubits"]) == gn
        restored = arrays["psi"]
        if isinstance(restored, np.ndarray):        # npz fallback path
            restored = jax.device_put(
                jnp.asarray(restored),
                NamedSharding(qmesh, P(None, "qubits")))
        probs2 = np.asarray(jax.device_get(
            sharded_probs_fn(splan, qmesh, targets=[0, 5])(restored)))
        ckpt_ok = int(np.allclose(probs2, want, atol=1e-5))

    # --- mesh-sharded particle ensemble ACROSS hosts ---------------------
    # branch/outcome particles ride the cross-host (DCN) particle axis
    # while each register shards over the intra-host qubit axis — the
    # full SURVEY §7 decision-2 composition at multi-host scale
    from qbot_tpu.frontend.lowering import (
        lower_program,
        run_lowered_sharded_ensemble,
    )

    src = ("qset tensorExp(computation.kets[0], 4)\n"
           "gate hadamardGate ; 0\n"
           "gate pauliXGate ; 3 ; [0]\n"
           "meas m ; computation ; [0]\n"
           "disc [3]\n"
           "meas w ; computation ; [0, 1]")
    lp = lower_program(src, mid_measure=True)
    res2, ens2, perm2, _ = run_lowered_sharded_ensemble(
        lp, mesh=mesh, max_particles=64, collapse_mode="projective")
    assert abs(sum(res2["m"].probs) - 1.0) < 1e-4
    assert abs(res2["m"].probs[0] - 0.5) < 1e-4       # Bell-pair marginal
    assert ens2.psi.shape[-1] == 2**3                 # register shrank
    ens_m0 = float(res2["w"].probs[0])

    print(f"OK {psum_val} {mean_val:.6f} {probs[0]:.6f} {ckpt_ok} "
          f"{ens_m0:.6f}", flush=True)


if __name__ == "__main__":
    main()
