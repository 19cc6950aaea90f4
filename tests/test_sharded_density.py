"""Sharded planar density-matrix executor vs the dense complex oracle.

The reference's only state representation is a density matrix with every op
defined on it (/root/reference/qbot/qgates.py:278-279, density.py:7-240);
this suite proves mixed states run 8-way sharded: the (2, 2^n, 2^n) planar
ρ, viewed flat over 2n qubit axes, reuses the statevector reshard machinery
(rows at physical s, columns at n+s — SURVEY.md §5 long-context slot).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qbot_tpu.ops import core
from qbot_tpu.tpu.circuit import Circuit, grover_circuit, random_circuit
from qbot_tpu.tpu.compiler import compile_circuit
from qbot_tpu.tpu.planar import (
    apply_plan_density_planar,
    planar_density_probs,
    to_planar,
)
from qbot_tpu.tpu.sharded import (
    compile_sharded_density,
    density_circuit,
    make_sharded_planar_runner,
    shard_density,
    sharded_density_probs_fn,
    sharded_zero_density,
    unpermute_density,
)
from qbot_tpu.tpu.sharding import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 emulated devices")


def _mesh(K):
    return make_mesh((1, K), devices=jax.devices()[:K])


def _oracle_rho(circ: Circuit, rho0: np.ndarray) -> np.ndarray:
    """Dense complex oracle: apply the circuit to ρ via the L1 engine."""
    rho = np.asarray(rho0, complex)
    for op in circ.ops:
        if op.kind == "gate":
            rho = core.apply_controlled(rho, np.asarray(op.matrix, complex),
                                        list(op.targets), list(op.controls))
        elif op.kind == "diag":
            rho = core.apply_gate_targets(rho, np.diag(op.matrix),
                                          list(op.targets))
        elif op.kind == "flip":
            d = np.ones(rho.shape[0])
            d[op.index] = -1.0
            rho = d[:, None] * rho * d[None, :]
    return rho


def _mixed_rho(n: int, seed: int = 3) -> np.ndarray:
    """A genuinely mixed product-free test state: random 3-component mixture."""
    rng = np.random.default_rng(seed)
    rho = np.zeros((2**n, 2**n), complex)
    for w in (0.5, 0.3, 0.2):
        k = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
        k /= np.linalg.norm(k)
        rho += w * np.outer(k, k.conj())
    return rho


def _planar_rho(rho: np.ndarray) -> np.ndarray:
    return np.stack([rho.real, rho.imag]).astype(np.float32)


def _run_sharded(circ: Circuit, rho0: np.ndarray, k: int, params=None):
    mesh = _mesh(2**k)
    splan = compile_sharded_density(circ, k)
    run = make_sharded_planar_runner(splan, mesh)
    out = run(shard_density(_planar_rho(rho0), mesh), params)
    rho = np.asarray(unpermute_density(np.asarray(out), splan.final_perm))
    return rho[0] + 1j * rho[1], splan, mesh


class TestDensityCircuit:
    def test_doubles_register_and_ops(self):
        c = Circuit(3).h(0).cx(0, 2)
        dc = density_circuit(c)
        assert dc.n == 6
        assert len(dc.ops) == 2 * len(c.ops)
        # column twin acts on axes +n with the conjugate matrix
        assert dc.ops[1].targets == (3,)
        np.testing.assert_allclose(dc.ops[1].matrix,
                                   np.conj(c.ops[0].matrix))

    def test_flip_becomes_row_and_column_diag(self):
        c = Circuit(3).phase_flip(5)
        dc = density_circuit(c)
        assert [op.kind for op in dc.ops] == ["diag", "diag"]
        assert dc.ops[0].targets == (0, 1, 2)
        assert dc.ops[1].targets == (3, 4, 5)
        assert dc.ops[0].matrix[5] == -1.0


class TestShardedDensityExecution:
    def test_pure_state_circuit_matches_oracle(self):
        n, k = 5, 3
        c = random_circuit(n, 2, seed=7)
        rho0 = np.zeros((2**n, 2**n), complex)
        rho0[0, 0] = 1.0
        want = _oracle_rho(c, rho0)
        got, splan, _ = _run_sharded(c, rho0, k)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_mixed_state_matches_oracle(self):
        n, k = 5, 3
        c = random_circuit(n, 2, seed=11)
        rho0 = _mixed_rho(n)
        want = _oracle_rho(c, rho0)
        got, _, _ = _run_sharded(c, rho0, k)
        np.testing.assert_allclose(got, want, atol=1e-4)
        # trace preserved and state still mixed
        assert abs(np.trace(got) - 1.0) < 1e-4
        assert np.trace(got @ got).real < 0.99

    def test_grover_with_flips_on_density(self):
        n, k = 4, 2
        c = grover_circuit(n, marked=9, iterations=3)
        rho0 = np.zeros((2**n, 2**n), complex)
        rho0[0, 0] = 1.0
        want = _oracle_rho(c, rho0)
        got, _, _ = _run_sharded(c, rho0, k)
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert got[9, 9].real > 0.9

    def test_matches_single_chip_planar_density(self):
        n, k = 4, 2
        c = random_circuit(n, 2, seed=5)
        rho0 = _mixed_rho(n, seed=9)
        plan = compile_circuit(c)
        want = np.asarray(apply_plan_density_planar(
            jnp.asarray(_planar_rho(rho0)), plan))
        got, _, _ = _run_sharded(c, rho0, k)
        np.testing.assert_allclose(got, want[0] + 1j * want[1], atol=1e-4)

    def test_param_circuit_density(self):
        n, k = 4, 2
        c = Circuit(n)
        for q in range(n):
            c.pry(q, q)
        c.cx(0, 3)
        theta = np.linspace(0.2, 1.1, n).astype(np.float32)
        import qbot_tpu.ops.gates as g
        cc = Circuit(n)
        for q in range(n):
            cc.ry(q, float(theta[q]))
        cc.cx(0, 3)
        rho0 = _mixed_rho(n, seed=2)
        want = _oracle_rho(cc, rho0)
        got, _, _ = _run_sharded(c, rho0, k, params=jnp.asarray(theta))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_density_init(self):
        n, k = 4, 3
        mesh = _mesh(2**k)
        c = Circuit(n).h(0).cx(0, 1)
        splan = compile_sharded_density(c, k)
        run = make_sharded_planar_runner(splan, mesh)
        out = run(sharded_zero_density(n, mesh))
        rho = np.asarray(unpermute_density(np.asarray(out),
                                           splan.final_perm))
        rho_c = rho[0] + 1j * rho[1]
        want = _oracle_rho(c, np.eye(2**n, dtype=complex)[:1].T @
                           np.eye(2**n, dtype=complex)[:1].conj())
        np.testing.assert_allclose(rho_c, want, atol=1e-5)


class TestShardedDensityProbs:
    def test_full_distribution(self):
        n, k = 5, 3
        c = random_circuit(n, 2, seed=21)
        rho0 = _mixed_rho(n, seed=4)
        mesh = _mesh(2**k)
        splan = compile_sharded_density(c, k)
        run = make_sharded_planar_runner(splan, mesh)
        out = run(shard_density(_planar_rho(rho0), mesh))
        probs = np.asarray(sharded_density_probs_fn(splan, mesh)(out))
        want = np.real(np.diag(_oracle_rho(c, rho0)))
        np.testing.assert_allclose(probs, want, atol=1e-4)

    def test_marginal_targets_straddle_shard_boundary(self):
        n, k = 5, 3
        c = random_circuit(n, 2, seed=22)
        rho0 = _mixed_rho(n, seed=6)
        mesh = _mesh(2**k)
        splan = compile_sharded_density(c, k)
        run = make_sharded_planar_runner(splan, mesh)
        out = run(shard_density(_planar_rho(rho0), mesh))
        probs = np.asarray(
            sharded_density_probs_fn(splan, mesh, targets=[0, 4])(out))
        want_rho = _oracle_rho(c, rho0)
        want = np.asarray(planar_density_probs(
            jnp.asarray(_planar_rho(want_rho)), targets=[0, 4], n=n))
        np.testing.assert_allclose(probs, want, atol=1e-4)


class TestShardedDensityDiscard:
    """Sharded partial trace: disc on a register-doubled sharded rho
    producing the REDUCED sharded rho (round-2 missing item 3)."""

    @pytest.mark.parametrize("k", [1, 2])
    @pytest.mark.parametrize("targets", [[0], [2], [0, 3], [1, 2]])
    def test_matches_dense_partial_trace(self, k, targets):
        from qbot_tpu.tpu.sharded import sharded_density_discard

        n = 4
        mesh = _mesh(2**k)
        circ = Circuit(n)
        H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
        X = np.array([[0, 1], [1, 0]], dtype=complex)
        circ.gate(H, [0])
        circ.gate(X, [3], controls=[0])
        circ.gate(H, [1])
        rho0 = _mixed_rho(n)
        dense = _oracle_rho(circ, rho0)
        want = np.asarray(core.partial_trace_keep(
            dense, [q for q in range(n) if q not in targets]))

        splan = compile_sharded_density(circ, k)
        run = make_sharded_planar_runner(splan, mesh)
        out = run(shard_density(_planar_rho(rho0), mesh))
        reduced, new_perm = sharded_density_discard(
            out, n, k, targets, mesh, perm=splan.final_perm)
        got = np.asarray(unpermute_density(np.asarray(reduced), new_perm))
        got = got[0] + 1j * got[1]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_reduced_rho_keeps_running(self):
        """The reduced sharded rho stays executable: compile a follow-up
        circuit on the shrunk register with the returned perm."""
        from qbot_tpu.tpu.sharded import sharded_density_discard

        n, k = 4, 1
        mesh = _mesh(2**k)
        H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
        circ = Circuit(n)
        circ.gate(H, [0])
        rho0 = _mixed_rho(n)
        splan = compile_sharded_density(circ, k)
        out = make_sharded_planar_runner(splan, mesh)(
            shard_density(_planar_rho(rho0), mesh))
        reduced, new_perm = sharded_density_discard(
            out, n, k, [1], mesh, perm=splan.final_perm)

        post = Circuit(n - 1)
        post.gate(H, [0])
        from qbot_tpu.tpu.sharded import compile_sharded
        splan2 = compile_sharded(density_circuit(post), k,
                                 initial_perm=new_perm)
        out2 = make_sharded_planar_runner(splan2, mesh)(reduced)
        got = np.asarray(unpermute_density(np.asarray(out2),
                                           splan2.final_perm))
        got = got[0] + 1j * got[1]

        dense = _oracle_rho(circ, rho0)
        red = np.asarray(core.partial_trace_keep(dense, [0, 2, 3]))
        want = _oracle_rho(post, red)
        np.testing.assert_allclose(got, want, atol=1e-5)
