"""Sharded particle-ensemble executor vs single-device + dense oracles.

The (particles × qubits) mesh executor (qbot_tpu.tpu.sharded_ensemble +
run_lowered_sharded_ensemble) must reproduce the single-device ensemble
runner (run_lowered_ensemble) and, at small n, the dense interpreter —
including mid-circuit meas, disc (register shrink), non-computation
bases, and the pruned-mass bound.  All on the emulated 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax

from qbot_tpu.frontend.lowering import (
    lower_program,
    run_lowered_ensemble,
    run_lowered_sharded_ensemble,
)
from qbot_tpu.tpu.sharding import make_mesh


def _mesh(p, q):
    return make_mesh((p, q), devices=jax.devices()[:p * q])


MESHES = [(1, 4), (2, 2), (4, 1), (2, 4)]


def _run_both(src, mesh_shape, **kw):
    lp1 = lower_program(src, mid_measure=True)
    ref_results, ref_ens = run_lowered_ensemble(lp1, **kw)
    lp2 = lower_program(src, mid_measure=True)
    res, ens, perm, emesh = run_lowered_sharded_ensemble(
        lp2, mesh=_mesh(*mesh_shape), **kw)
    return ref_results, ref_ens, res, ens, perm


class TestShardedEnsembleParity:
    SRC_MID = ("qset tensorExp(comp[0], 5)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 3 ; [0]\n"
               "gate hadamardGate ; 1\n"
               "meas a ; computation ; [0]\n"
               "gate pauliXGate ; 4 ; [3]\n"
               "meas b ; computation ; [3, 4]")

    @pytest.mark.parametrize("p,q", MESHES)
    def test_mid_circuit_meas_matches_single_device(self, p, q):
        ref_results, ref_ens, res, ens, perm = _run_both(
            self.SRC_MID, (p, q))
        for name in ("a", "b"):
            np.testing.assert_allclose(res[name].probs,
                                       ref_results[name].probs, atol=1e-5)

    @pytest.mark.parametrize("p,q", [(2, 2), (1, 4)])
    def test_final_mixture_matches_single_device(self, p, q):
        from qbot_tpu.inference.ensemble_exec import ensemble_mixture
        from qbot_tpu.tpu.sharded_ensemble import sharded_ensemble_mixture

        ref_results, ref_ens, res, ens, perm = _run_both(
            self.SRC_MID, (p, q))
        np.testing.assert_allclose(
            sharded_ensemble_mixture(ens, perm), ensemble_mixture(ref_ens),
            atol=1e-5)

    @pytest.mark.parametrize("p,q", MESHES)
    def test_disc_register_shrink(self, p, q):
        src = ("qset tensorExp(comp[0], 5)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 2 ; [0]\n"
               "disc [0, 3]\n"
               "meas m ; computation")
        ref_results, ref_ens, res, ens, perm = _run_both(src, (p, q))
        np.testing.assert_allclose(res["m"].probs, ref_results["m"].probs,
                                   atol=1e-5)
        # the register genuinely shrank: 3 qubits of planar state remain
        assert ens.psi.shape[-1] == 2**3
        assert len(perm) == 3

    def test_disc_matches_dense_interpreter(self):
        from qbot_tpu.frontend.interpreter import executeTxt

        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 3 ; [0]\n"
               "disc [1, 3]\n"
               "meas m ; computation")
        ns = executeTxt(src)
        lp = lower_program(src, mid_measure=True)
        res, ens, perm, emesh = run_lowered_sharded_ensemble(
            lp, mesh=_mesh(2, 2))
        np.testing.assert_allclose(res["m"].probs, ns["m"].probs, atol=1e-6)
        from qbot_tpu.tpu.sharded_ensemble import sharded_ensemble_mixture
        np.testing.assert_allclose(sharded_ensemble_mixture(ens, perm),
                                   np.asarray(ns["state"], complex),
                                   atol=1e-5)

    @pytest.mark.parametrize("p,q", [(2, 2)])
    def test_bell_basis_mid_measurement(self, p, q):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas b ; bell ; [0, 1]\n"
               "gate hadamardGate ; 2")
        ref_results, ref_ens, res, ens, perm = _run_both(src, (p, q))
        np.testing.assert_allclose(res["b"].probs, ref_results["b"].probs,
                                   atol=1e-5)

    def test_peek_does_not_collapse(self):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "peek p ; computation ; [0]\n"
               "meas m ; computation ; [0, 1]")
        ref_results, ref_ens, res, ens, perm = _run_both(src, (2, 2))
        np.testing.assert_allclose(res["p"].probs, [0.5, 0.5], atol=1e-6)
        np.testing.assert_allclose(res["m"].probs,
                                   ref_results["m"].probs, atol=1e-5)

    def test_mixed_state_prep(self):
        src = ("qset ProbVal([0.25, 0.75], [comp[0], comp[1]])\n"
               "gate hadamardGate ; 0\n"
               "meas m ; computation")
        ref_results, ref_ens, res, ens, perm = _run_both(src, (2, 1))
        np.testing.assert_allclose(res["m"].probs,
                                   ref_results["m"].probs, atol=1e-5)

    def test_lost_mass_bound_matches(self):
        import warnings

        src = ("qset tensorExp(comp[0], 4)\n"
               + "".join(f"gate hadamardGate ; {q}\n" for q in range(4))
               + "meas a ; computation ; [0]\n"
               "meas b ; computation ; [1]\n"
               "meas c ; computation ; [2]")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            lp1 = lower_program(src, mid_measure=True)
            _, ref_ens = run_lowered_ensemble(lp1, max_particles=3)
            lp2 = lower_program(src, mid_measure=True)
            res, ens, perm, emesh = run_lowered_sharded_ensemble(
                lp2, mesh=_mesh(1, 2), max_particles=3)
        # P=1: the per-shard quota prune IS the global top-k — bounds match
        np.testing.assert_allclose(float(np.asarray(ens.lost_mass)),
                                   float(ref_ens.lost_mass), rtol=1e-6)

    def test_smc_sampled_mode(self):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas m ; computation ; [0]\n"
               "meas w ; computation ; [1]")
        lp = lower_program(src, mid_measure=True)
        res, ens, perm, emesh = run_lowered_sharded_ensemble(
            lp, mesh=_mesh(2, 2), sample=64, seed=5)
        # Bell pair: first marginal exactly 1/2; the second depends on the
        # sampled outcomes (all particles collapse consistently)
        np.testing.assert_allclose(res["m"].probs, [0.5, 0.5], atol=1e-6)
        assert ens.num_particles == 64
        s = sum(res["w"].probs)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_epilogue_runs_with_results_bound(self, capsys):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "meas m ; computation ; [0]\n"
               "cout m.probs[0]")
        lp = lower_program(src, mid_measure=True)
        run_lowered_sharded_ensemble(lp, mesh=_mesh(2, 2))
        assert "0.5" in capsys.readouterr().out


class TestShardedEnsembleScale:
    def test_20q_mid_circuit_meas_and_disc(self):
        """The round-2 criterion: a 20+-qubit sharded program with a
        mid-circuit meas AND a disc matches the (single-device) ensemble
        oracle on the 8-device mesh."""
        # NOTE: prep via a KET power — tensorExp of a density matrix would
        # materialise a dense 2^20 × 2^20 ρ on the host
        src = ("qset tensorExp(computation.kets[0], 20)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 19 ; [0]\n"
               "gate hadamardGate ; 10\n"
               "meas a ; computation ; [0, 19]\n"
               "disc [10]\n"
               "meas b ; computation ; [0, 17]")
        # projective collapse: the K-way fan-out (vs reference's K²) and
        # the zero-communication masked split for sharded-axis targets
        lp1 = lower_program(src, mid_measure=True)
        ref_results, _ = run_lowered_ensemble(lp1, max_particles=64,
                                              collapse_mode="projective")
        lp2 = lower_program(src, mid_measure=True)
        res, ens, perm, emesh = run_lowered_sharded_ensemble(
            lp2, mesh=_mesh(2, 4), max_particles=64,
            collapse_mode="projective")
        for name in ("a", "b"):
            np.testing.assert_allclose(res[name].probs,
                                       ref_results[name].probs, atol=1e-5)
        assert ens.psi.shape[-1] == 2**19
