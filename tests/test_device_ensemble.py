"""Device-ensemble program runner vs the host ensemble runner.

ProbVal control flow forking DEVICE particles (SURVEY.md §7 decision 2:
branch count is a sharding/particle axis) must produce the SAME merged
namespace as qbot_tpu.frontend.ensemble's dense host runner.
"""
import numpy as np
import pytest

from qbot_tpu.frontend.device_ensemble import (
    execute_lines_device_ensemble,
    executeTxtDeviceEnsemble,
)
from qbot_tpu.frontend.ensemble import executeTxtEnsemble
from qbot_tpu.probval import ProbVal


def _both(src, **kw):
    host = executeTxtEnsemble(src)
    dev = executeTxtDeviceEnsemble(src, **kw)
    return host, dev


def _assert_state_close(host, dev, atol=1e-5):
    np.testing.assert_allclose(np.asarray(dev["state"], complex),
                               np.asarray(host["state"], complex),
                               atol=atol)


class TestDeviceBranching:
    def test_probabilistic_branching_example(self):
        with open("examples/probabilistic_branching.qb") as f:
            src = f.read()
        host, dev = _both(src)
        _assert_state_close(host, dev)

    def test_cjmp_fork_and_classical_merge(self):
        src = ("cdef x ; 1\n"
               "qset comp[0]\n"
               "cjmp flip ; ProbVal([0.25, 0.75], [True, False])\n"
               "cdef x ; 2\n"
               "halt\n"
               "mark flip\n"
               "gate pauliXGate\n"
               "cdef x ; 3")
        host, dev = _both(src)
        _assert_state_close(host, dev)
        assert isinstance(dev["x"], ProbVal)
        assert dev["x"].is_equivalent(host["x"])

    def test_probval_halt_and_retr(self):
        src = ("cdef hits ; 0\n"
               "qset comp[0]\n"
               "jump body\n"
               "cdef hits ; hits + 10\n"
               "halt\n"
               "mark body\n"
               "gate hadamardGate\n"
               "cdef hits ; hits + 1\n"
               "retr ProbVal([0.5, 0.5], [True, False])\n"
               "cdef hits ; hits + 100")
        host, dev = _both(src)
        _assert_state_close(host, dev)
        assert dev["hits"].is_equivalent(host["hits"])

    def test_probval_gate_operand_fans_on_device(self):
        src = ("qset tensorProd(comp[0], comp[0])\n"
               "gate ProbVal([0.5, 0.5], [pauliXGate, identityGate]) ; 0")
        host, dev = _both(src)
        _assert_state_close(host, dev)

    def test_probval_conditional_mixes_on_particle_axis(self):
        src = ("qset comp[0]\n"
               "gate pauliXGate ; 0 ; [] ; ProbVal([0.3, 0.7], [True, False])")
        host, dev = _both(src)
        _assert_state_close(host, dev)

    def test_probval_target_and_swap(self):
        src = ("qset tensorProd(comp[0], comp[1], comp[0])\n"
               "swap 1 ; ProbVal([0.5, 0.5], [0, 2])")
        host, dev = _both(src)
        _assert_state_close(host, dev)

    def test_meas_disc_inside_branches(self):
        src = ("qset tensorProd(comp[0], comp[0])\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "cjmp alt ; ProbVal([0.5, 0.5], [True, False])\n"
               "meas m ; computation ; [0]\n"
               "halt\n"
               "mark alt\n"
               "disc 0")
        host, dev = _both(src)
        # branch registers differ in size: state merges as a ProbVal
        assert isinstance(dev["state"], ProbVal) == isinstance(
            host["state"], ProbVal)
        # m is bound only in the measuring branch: merged as ProbVal with a
        # None branch (reference collapseNamespaces behaviour)
        def bound(v):
            if isinstance(v, ProbVal):
                return next(x for x in v.values if x is not None)
            return v

        np.testing.assert_allclose(bound(dev["m"]).probs,
                                   bound(host["m"]).probs, atol=1e-6)

    def test_mixed_prep_on_device_runner(self):
        src = ("qset ProbVal([0.25, 0.75], [comp[0], comp[1]])\n"
               "gate hadamardGate\n"
               "peek p ; computation")
        host, dev = _both(src)
        _assert_state_close(host, dev)
        np.testing.assert_allclose(dev["p"].probs, host["p"].probs,
                                   atol=1e-6)

    def test_bell_basis_meas_on_device_runner(self):
        src = ("qset tensorProd(comp[0], comp[0])\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas b ; bell")
        host, dev = _both(src)
        np.testing.assert_allclose(dev["b"].probs, host["b"].probs,
                                   atol=1e-6)
        _assert_state_close(host, dev)

    def test_sampled_mode_runs_fixed_particles(self):
        src = ("qset tensorProd(comp[0], comp[0])\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas m ; computation ; [0]")
        res, finished = execute_lines_device_ensemble(
            src.splitlines(), sample=32, seed=3)
        assert all(p.qreg.num_particles == 32 for p in finished)
        m = res.namespace["m"]
        np.testing.assert_allclose(m.probs, [0.5, 0.5], atol=1e-6)

    def test_device_particles_shared_across_fork(self):
        # forked branches must SHARE the device register (no copy)
        src = ("qset comp[0]\n"
               "gate hadamardGate\n"
               "cjmp end ; ProbVal([0.5, 0.5], [True, False])\n"
               "mark end")
        _, finished = execute_lines_device_ensemble(src.splitlines())
        assert len(finished) == 2
        assert finished[0].qreg.psi is finished[1].qreg.psi


class TestProbValDiscTargets:
    """ProbVal target sets on ``disc`` across the device paths (round-2
    item 8): host-forked particles on the device-ensemble runner, and
    weighted per-branch mixtures on the lowered executors — all
    differential against the dense/host runners."""

    SAME_SIZE = ("qset tensorExp(comp[0], 3)\n"
                 "gate hadamardGate ; 0\n"
                 "gate pauliXGate ; 2 ; [0]\n"
                 "disc ProbVal([0.25, 0.75], [[0], [2]])\n"
                 "meas m ; computation")

    def test_device_ensemble_same_size(self):
        host, dev = _both(self.SAME_SIZE)
        np.testing.assert_allclose(dev["m"].probs, host["m"].probs,
                                   atol=1e-5)
        _assert_state_close(host, dev)

    def test_device_ensemble_differing_sizes_errors_like_host(self):
        import qbot_tpu.errors as err

        src = ("qset tensorExp(comp[0], 3)\n"
               "gate hadamardGate ; 0\n"
               "disc ProbVal([0.5, 0.5], [[0], [0, 1]])")
        # differing widths cannot fold into one register: the reference's
        # own toDensityMatrix fails on mixed shapes — both runners render
        # the same script-level type error
        with pytest.raises(err.QbotScriptError):
            executeTxtEnsemble(src)
        with pytest.raises(err.QbotScriptError):
            executeTxtDeviceEnsemble(src)

    def test_lowered_ensemble_same_size(self):
        from qbot_tpu.frontend.interpreter import executeTxt
        from qbot_tpu.frontend.lowering import (
            lower_program,
            run_lowered_ensemble,
        )

        ns = executeTxt(self.SAME_SIZE)
        lp = lower_program(self.SAME_SIZE, mid_measure=True)
        results, ens = run_lowered_ensemble(lp)
        np.testing.assert_allclose(results["m"].probs, ns["m"].probs,
                                   atol=1e-6)

    def test_lowered_rejects_differing_sizes(self):
        from qbot_tpu.frontend.lowering import LoweringError, lower_program

        src = ("qset tensorExp(comp[0], 3)\n"
               "disc ProbVal([0.5, 0.5], [[0], [0, 1]])")
        with pytest.raises(LoweringError, match="differing sizes"):
            lower_program(src, mid_measure=True)

    def test_sharded_ensemble_same_size(self):
        import jax

        from qbot_tpu.frontend.interpreter import executeTxt
        from qbot_tpu.frontend.lowering import (
            lower_program,
            run_lowered_sharded_ensemble,
        )
        from qbot_tpu.tpu.sharding import make_mesh

        src = ("qset tensorExp(comp[0], 5)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 4 ; [0]\n"
               "disc ProbVal([0.25, 0.75], [[0], [4]])\n"
               "meas m ; computation")
        ns = executeTxt(src)
        lp = lower_program(src, mid_measure=True)
        mesh = make_mesh((2, 2), devices=jax.devices()[:4])
        results, ens, perm, emesh = run_lowered_sharded_ensemble(
            lp, mesh=mesh)
        np.testing.assert_allclose(results["m"].probs, ns["m"].probs,
                                   atol=1e-5)


class TestShardedDeviceEnsemble:
    """--compile --ensemble composing with the mesh: ProbVal control flow
    forks host particles whose registers are (particles × qubits)-sharded
    ensembles; the merged namespace must match the host ensemble runner
    (SURVEY §7 decision 2 done-criterion)."""

    @staticmethod
    def _mesh(p, q):
        import jax

        from qbot_tpu.tpu.sharding import make_mesh
        return make_mesh((p, q), devices=jax.devices()[:p * q])

    @pytest.mark.parametrize("p,q", [(2, 4), (4, 2), (8, 1), (1, 2)])
    def test_branching_mid_measurement_matches_host(self, p, q):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 3 ; [0]\n"
               "cjmp alt ; ProbVal([0.5, 0.5], [True, False])\n"
               "meas m ; computation ; [0]\n"
               "gate hadamardGate ; 1\n"
               "halt\n"
               "mark alt\n"
               "meas m ; computation ; [3]\n"
               "disc 0")
        host = executeTxtEnsemble(src)
        dev = executeTxtDeviceEnsemble(src, mesh=self._mesh(p, q))
        assert isinstance(dev["state"], ProbVal) == isinstance(
            host["state"], ProbVal)
        np.testing.assert_allclose(dev["m"].probs, host["m"].probs,
                                   atol=1e-5)

    def test_probval_gate_fanout_on_mesh(self):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate ProbVal([0.5, 0.5], [pauliXGate, hadamardGate]) ; 0\n"
               "meas m ; computation ; [0]")
        host = executeTxtEnsemble(src)
        dev = executeTxtDeviceEnsemble(src, mesh=self._mesh(2, 2))
        np.testing.assert_allclose(dev["m"].probs, host["m"].probs,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev["state"], complex),
                                   np.asarray(host["state"], complex),
                                   atol=1e-5)

    def test_bell_basis_on_mesh(self):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas b ; bell ; [0, 1]")
        host = executeTxtEnsemble(src)
        dev = executeTxtDeviceEnsemble(src, mesh=self._mesh(2, 2))
        np.testing.assert_allclose(dev["b"].probs, host["b"].probs,
                                   atol=1e-5)

    def test_smc_mode_on_mesh(self):
        src = ("qset tensorExp(comp[0], 4)\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 1 ; [0]\n"
               "meas m ; computation ; [0]")
        dev = executeTxtDeviceEnsemble(src, mesh=self._mesh(2, 2),
                                       sample=32, seed=3)
        np.testing.assert_allclose(dev["m"].probs, [0.5, 0.5], atol=1e-6)


class TestLostMassTracking:
    """The device-ensemble runner must report the SAME cumulative
    pruned-mass bound as the lowered-ensemble runner — mass is never
    dropped silently on the --compile --ensemble path (round-2 defect:
    _Engine.concat/prune reset lost_mass to 0)."""

    SRC = ("qset tensorExp(comp[0], 3)\n"
           "gate hadamardGate ; 0\n"
           "gate hadamardGate ; 1\n"
           "gate hadamardGate ; 2\n"
           "meas a ; computation ; [0]\n"
           "meas b ; computation ; [1]\n"
           "meas c ; computation ; [2]")

    def test_bound_matches_lowered_runner(self):
        import warnings

        from qbot_tpu.frontend.lowering import (
            lower_program,
            run_lowered_ensemble,
        )

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            res, finished = execute_lines_device_ensemble(
                self.SRC.splitlines(), max_particles=3)
            lp = lower_program(self.SRC, mid_measure=True)
            _, ens = run_lowered_ensemble(lp, max_particles=3)
        assert res.lost_mass > 0.0
        np.testing.assert_allclose(res.lost_mass, float(ens.lost_mass),
                                   rtol=1e-6)

    def test_prune_warning_emitted(self):
        with pytest.warns(RuntimeWarning, match="pruning dropped"):
            execute_lines_device_ensemble(self.SRC.splitlines(),
                                          max_particles=3)

    def test_exact_run_reports_zero(self):
        res, _ = execute_lines_device_ensemble(self.SRC.splitlines(),
                                               max_particles=4096)
        assert res.lost_mass == 0.0


class TestDeviceTargetedQset:
    """Targeted qset on the device-ensemble runner (reference
    replaceArbitrary) must match the host ensemble runner."""

    def test_targeted_qset_matches_host(self):
        src = ("qset tensorProd(comp[0], comp[0], comp[0])\n"
               "gate hadamardGate ; 0\n"
               "gate pauliXGate ; 2 ; [0]\n"
               "qset hadamard.kets[1] ; [0]\n"
               "meas m ; computation")
        host, dev = _both(src)
        _assert_state_close(host, dev)
        np.testing.assert_allclose(dev["m"].probs, host["m"].probs,
                                   atol=1e-6)

    def test_probval_targets_match_host(self):
        src = ("qset tensorProd(comp[0], comp[0], comp[0])\n"
               "gate hadamardGate ; 1\n"
               "qset comp[1] ; ProbVal([0.5, 0.5], [[0], [2]])\n"
               "meas m ; computation")
        host, dev = _both(src)
        _assert_state_close(host, dev)

    def test_sample_mode_matches_exact(self):
        # round 5 (VERDICT r4 #5): targeted qset WORKS under sample > 0
        src = ("qset tensorProd(comp[0], comp[0])\n"
               "gate hadamardGate ; 1\n"
               "qset comp[1] ; [0]\n"
               "meas m ; computation")
        exact = executeTxtDeviceEnsemble(src)
        sampled = executeTxtDeviceEnsemble(src, sample=1024, seed=4)
        np.testing.assert_allclose(sampled["m"].probs, exact["m"].probs,
                                   atol=0.06)
