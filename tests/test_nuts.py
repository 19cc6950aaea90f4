"""NUTS sampler: correctness on closed-form targets + circuit posteriors."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from qbot_tpu.inference.hmc import hmc_init, make_circuit_log_prob
from qbot_tpu.inference.nuts import (
    nuts_step,
    nuts_warmup,
    run_nuts,
    run_nuts_chains,
)


def _gauss_log_prob(mean, var):
    mean = jnp.asarray(mean)
    var = jnp.asarray(var)

    def lp(theta):
        return -0.5 * jnp.sum((theta - mean) ** 2 / var)

    return lp


class TestNutsStep:
    def test_single_step_moves_and_is_finite(self):
        lp = _gauss_log_prob(jnp.zeros(3), jnp.ones(3))
        state = hmc_init(lp, jnp.array([2.0, -1.0, 0.5]))
        new, stats = jax.jit(
            lambda k, s: nuts_step(k, s, lp, 0.3, max_tree_depth=6)
        )(jax.random.PRNGKey(0), state)
        assert np.all(np.isfinite(np.asarray(new.position)))
        assert float(stats.accept_prob) > 0.0
        assert int(stats.num_leaves) >= 1
        assert not bool(stats.diverged)

    def test_tree_depth_bounded(self):
        lp = _gauss_log_prob(jnp.zeros(2), jnp.ones(2))
        state = hmc_init(lp, jnp.zeros(2))
        _, stats = nuts_step(jax.random.PRNGKey(1), state, lp, 0.05,
                             max_tree_depth=4)
        assert int(stats.depth) <= 4
        assert int(stats.num_leaves) <= 2**4

    def test_divergence_flag_on_huge_step(self):
        # a pathological step size on a narrow target must diverge or turn,
        # never produce NaNs in the kept position
        lp = _gauss_log_prob(jnp.zeros(2), jnp.full(2, 1e-6))
        state = hmc_init(lp, jnp.array([1.0, 1.0]))
        new, stats = nuts_step(jax.random.PRNGKey(2), state, lp, 50.0,
                               max_tree_depth=6)
        assert np.all(np.isfinite(np.asarray(new.position)))


class TestNutsChain:
    def test_gaussian_moments(self):
        mean = jnp.array([1.0, -2.0])
        var = jnp.array([1.0, 0.25])
        lp = _gauss_log_prob(mean, var)
        qs, lps, stats = jax.jit(
            lambda k: run_nuts(k, lp, jnp.zeros(2), 800, step_size=0.5,
                               max_tree_depth=6)
        )(jax.random.PRNGKey(3))
        samples = np.asarray(qs[200:])
        assert np.allclose(samples.mean(axis=0), np.asarray(mean), atol=0.25)
        assert np.allclose(samples.var(axis=0), np.asarray(var), atol=0.3)
        # healthy sampling: almost no divergences, decent acceptance
        assert float(np.asarray(stats.diverged).mean()) < 0.02
        assert float(np.asarray(stats.accept_prob).mean()) > 0.4

    def test_correlated_gaussian(self):
        prec = jnp.array([[2.0, 1.2], [1.2, 2.0]])

        def lp(theta):
            return -0.5 * theta @ prec @ theta

        qs, _, _ = run_nuts(jax.random.PRNGKey(4), lp, jnp.zeros(2), 1000,
                            step_size=0.4, max_tree_depth=7)
        samples = np.asarray(qs[200:])
        cov = np.cov(samples.T)
        expect = np.linalg.inv(np.asarray(prec))
        assert np.allclose(cov, expect, atol=0.35)

    def test_multichain_vmap(self):
        lp = _gauss_log_prob(jnp.zeros(2), jnp.ones(2))
        theta0 = jnp.stack([jnp.zeros(2), jnp.ones(2), -jnp.ones(2),
                            jnp.full(2, 2.0)])
        qs, lps, stats = run_nuts_chains(jax.random.PRNGKey(5), lp, theta0,
                                         50, step_size=0.5)
        assert qs.shape == (4, 50, 2)
        assert np.all(np.isfinite(np.asarray(qs)))
        # chains must decorrelate: distinct starting points end different
        finals = np.asarray(qs[:, -1])
        assert len({tuple(np.round(f, 6)) for f in finals}) == 4


class TestNutsWarmup:
    def test_step_size_adapts_to_scale(self):
        lp = _gauss_log_prob(jnp.zeros(2), jnp.full(2, 0.01))
        eps, state = nuts_warmup(jax.random.PRNGKey(6), lp, jnp.zeros(2),
                                 num_warmup=80, init_step_size=1.0)
        # target sd is 0.1; adapted step size must shrink well below init
        assert float(eps) < 0.6
        assert np.all(np.isfinite(np.asarray(state.position)))


class TestNutsCircuitPosterior:
    def test_recovers_rotation_angle(self):
        from qbot_tpu.tpu.circuit import Circuit
        from qbot_tpu.tpu.compiler import compile_circuit

        # 1-qubit Ry(θ): P(1) = sin²(θ/2); observe counts from θ*=π/2
        circ = Circuit(1)
        circ.pry(0)
        plan = compile_circuit(circ)
        true_p1 = 0.5
        counts = jnp.array([1000 * (1 - true_p1), 1000 * true_p1])
        lp = make_circuit_log_prob(plan, counts)

        eps, warm = nuts_warmup(jax.random.PRNGKey(7), lp,
                                jnp.array([0.3]), num_warmup=60,
                                init_step_size=0.1)
        qs, _, stats = run_nuts(jax.random.PRNGKey(8), lp, warm.position,
                                300, step_size=float(eps), max_tree_depth=6)
        samples = np.asarray(qs[50:]).ravel()
        p1_samples = np.sin(samples / 2) ** 2
        assert abs(p1_samples.mean() - true_p1) < 0.05
