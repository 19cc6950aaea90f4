"""No-U-Turn sampler over continuous gate parameters (jittable, iterative).

Completes the BASELINE north-star inference layer ("HMC/NUTS over continuous
gate parameters"; no analogue exists in the reference, which has no sampling
at all — README.md:50).  This is the *iterative* formulation of NUTS with

* multiplicative trajectory doubling to a static ``max_tree_depth`` (so the
  whole transition is a bounded ``lax.while_loop`` — XLA-compatible, no
  recursion, no dynamic shapes),
* multinomial leaf sampling with biased progressive updates
  (Betancourt 2017) instead of the original slice sampler,
* sub-tree U-turn detection via a fixed checkpoint stack of
  ``max_tree_depth + 1`` saved states: even-indexed leaf ``a`` is stored at
  slot ``popcount(a)``; arriving at leaf ``i``, every complete subtree
  ``[i+1-2^k, i]`` is checked against its stored left edge.  At most
  ``depth+1`` checkpoints are ever live simultaneously, so the stack never
  overflows (same scheme as the iterative-NUTS literature).

Leapfrog with ``±eps`` keeps all momenta in the forward time frame, so the
Hoffman–Gelman turning criterion ``⟨q⁺−q⁻, r⁻⟩<0 ∨ ⟨q⁺−q⁻, r⁺⟩<0`` applies
directly with ``delta = v·(q_new − q_stored)``.

``nuts_step`` is a pure function of (key, state) — ``vmap`` it over chains
and shard the chain axis on the ``particles`` mesh axis exactly like
:func:`qbot_tpu.inference.hmc.run_hmc_chains`.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from qbot_tpu.inference.hmc import HMCState, hmc_init

__all__ = ["NutsStats", "nuts_step", "run_nuts", "run_nuts_chains",
           "nuts_warmup"]

_DIVERGENCE = 1000.0


class NutsStats(NamedTuple):
    accept_prob: jax.Array      # averaged Metropolis prob over visited leaves
    num_leaves: jax.Array       # leapfrog steps taken this transition
    depth: jax.Array            # tree depth reached
    diverged: jax.Array
    turned: jax.Array


class _Tree(NamedTuple):
    # trajectory ends (forward-frame momenta)
    q_left: jax.Array
    r_left: jax.Array
    grad_left: jax.Array
    q_right: jax.Array
    r_right: jax.Array
    grad_right: jax.Array
    # current multinomial proposal
    q_prop: jax.Array
    lp_prop: jax.Array
    grad_prop: jax.Array
    log_sum_w: jax.Array        # logsumexp of leaf weights in the tree
    depth: jax.Array
    turning: jax.Array
    diverged: jax.Array
    sum_accept: jax.Array
    num_leaves: jax.Array
    key: jax.Array


def _leapfrog(lp_and_grad, q, r, grad, eps):
    r = r + 0.5 * eps * grad
    q = q + eps * r
    lp, grad = lp_and_grad(q)
    r = r + 0.5 * eps * grad
    return q, r, grad, lp


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _is_turning(delta, r_a, r_b):
    return (jnp.vdot(delta, r_a) < 0.0) | (jnp.vdot(delta, r_b) < 0.0)


def _build_subtree(lp_and_grad, q0, r0, grad0, v_eps, num_leaves, max_depth,
                   energy0, key):
    """Integrate ``num_leaves`` leapfrog steps from (q0, r0), tracking the
    subtree's multinomial proposal, weight, and internal U-turns.

    Returns (q_end, r_end, grad_end, q_prop, lp_prop, grad_prop, log_sum_w,
    turning, diverged, sum_accept).
    """
    dim = q0.shape[0]
    ckpt_q = jnp.zeros((max_depth + 1, dim), q0.dtype)
    ckpt_r = jnp.zeros((max_depth + 1, dim), q0.dtype)

    def leaf_step(carry):
        (i, q, r, grad, qp, lpp, gp, lsw, turning, diverged, s_acc,
         cq, cr, key) = carry
        q, r, grad, lp = _leapfrog(lp_and_grad, q, r, grad, v_eps)
        energy = lp - 0.5 * jnp.vdot(r, r).real
        diverged = diverged | ((energy0 - energy) > _DIVERGENCE)
        log_w = energy
        # biased multinomial proposal update within the subtree
        key, k_acc = jax.random.split(key)
        new_lsw = jnp.logaddexp(lsw, log_w)
        take = jnp.log(jax.random.uniform(k_acc, ())) < (log_w - new_lsw)
        qp = jnp.where(take, q, qp)
        lpp = jnp.where(take, lp, lpp)
        gp = jnp.where(take, grad, gp)
        s_acc = s_acc + jnp.minimum(1.0, jnp.exp(energy - energy0))

        # checkpoint even leaves at slot popcount(i)
        slot = _popcount(i)
        store = (i % 2) == 0
        cq = jnp.where(store, cq.at[slot].set(q), cq)
        cr = jnp.where(store, cr.at[slot].set(r), cr)

        # check every complete subtree ending at leaf i, vectorised over the
        # subtree sizes 2^1..2^max (masked by whether the subtree ends here)
        ks = jnp.arange(1, max_depth + 1)
        sizes = 1 << ks
        ends_here = ((i + 1) % sizes) == 0
        starts = i + 1 - sizes
        slots = _popcount(jnp.maximum(starts, 0))
        deltas = (q[None, :] - cq[slots]) * _eps_sign
        dot_a = jnp.einsum("kd,kd->k", deltas, cr[slots])
        dot_b = deltas @ r
        sub_turn = jnp.any(ends_here & ((dot_a < 0.0) | (dot_b < 0.0)))
        turning = turning | sub_turn

        return (i + 1, q, r, grad, qp, lpp, gp, new_lsw, turning, diverged,
                s_acc, cq, cr, key)

    def leaf_cond(carry):
        i = carry[0]
        turning, diverged = carry[8], carry[9]
        return (i < num_leaves) & (~turning) & (~diverged)

    _eps_sign = jnp.sign(v_eps)
    # the first leaf always replaces the proposal (lsw starts at -inf), so
    # the initial proposal slots are placeholders that cost no extra evals
    init = (jnp.int32(0), q0, r0, grad0,
            q0, -jnp.inf, grad0, -jnp.inf,
            jnp.bool_(False), jnp.bool_(False), 0.0,
            ckpt_q, ckpt_r, key)
    (i, q, r, grad, qp, lpp, gp, lsw, turning, diverged, s_acc,
     _, _, _) = jax.lax.while_loop(leaf_cond, leaf_step, init)
    return q, r, grad, qp, lpp, gp, lsw, turning, diverged, s_acc, i


def nuts_step(key: jax.Array, state: HMCState, log_prob: Callable,
              step_size: float, max_tree_depth: int = 8
              ) -> tuple[HMCState, NutsStats]:
    """One No-U-Turn transition (traceable; vmap over chains)."""
    lp_and_grad = jax.value_and_grad(log_prob)
    eps = jnp.asarray(step_size)
    key, k_mom = jax.random.split(key)
    r0 = jax.random.normal(k_mom, state.position.shape, state.position.dtype)
    energy0 = state.log_prob - 0.5 * jnp.vdot(r0, r0).real

    tree0 = _Tree(
        q_left=state.position, r_left=r0, grad_left=state.grad,
        q_right=state.position, r_right=r0, grad_right=state.grad,
        q_prop=state.position, lp_prop=state.log_prob, grad_prop=state.grad,
        log_sum_w=energy0 - energy0,   # leaf-0 weight relative to energy0 = 0
        depth=jnp.int32(0), turning=jnp.bool_(False),
        diverged=jnp.bool_(False), sum_accept=jnp.array(0.0),
        num_leaves=jnp.int32(0), key=key)

    def doubling_cond(tree: _Tree):
        return ((tree.depth < max_tree_depth) & (~tree.turning)
                & (~tree.diverged))

    def doubling_body(tree: _Tree):
        key, k_dir, k_sub, k_acc = jax.random.split(tree.key, 4)
        go_right = jax.random.bernoulli(k_dir, 0.5)
        v_eps = jnp.where(go_right, eps, -eps)
        q0 = jnp.where(go_right, tree.q_right, tree.q_left)
        r0_ = jnp.where(go_right, tree.r_right, tree.r_left)
        g0 = jnp.where(go_right, tree.grad_right, tree.grad_left)
        n_leaves = jnp.int32(1) << tree.depth

        (q_end, r_end, g_end, qp, lpp, gp, lsw, sub_turn, sub_div, s_acc,
         leaves_done) = _build_subtree(
            lp_and_grad, q0, r0_, g0, v_eps, n_leaves,
            max_tree_depth, energy0, k_sub)
        # subtree leaf weights are energies relative to energy0
        lsw = lsw - energy0

        bad = sub_turn | sub_div
        # biased progressive sampling across the doubling
        take = jnp.log(jax.random.uniform(k_acc, ())) < (lsw - tree.log_sum_w)
        take = take & ~bad
        q_prop = jnp.where(take, qp, tree.q_prop)
        lp_prop = jnp.where(take, lpp, tree.lp_prop)
        grad_prop = jnp.where(take, gp, tree.grad_prop)

        q_left = jnp.where(~bad & ~go_right, q_end, tree.q_left)
        r_left = jnp.where(~bad & ~go_right, r_end, tree.r_left)
        g_left = jnp.where(~bad & ~go_right, g_end, tree.grad_left)
        q_right = jnp.where(~bad & go_right, q_end, tree.q_right)
        r_right = jnp.where(~bad & go_right, r_end, tree.r_right)
        g_right = jnp.where(~bad & go_right, g_end, tree.grad_right)

        delta = q_right - q_left
        full_turn = _is_turning(delta, r_left, r_right)

        return _Tree(
            q_left, r_left, g_left, q_right, r_right, g_right,
            q_prop, lp_prop, grad_prop,
            jnp.where(bad, tree.log_sum_w,
                      jnp.logaddexp(tree.log_sum_w, lsw)),
            tree.depth + 1,
            tree.turning | sub_turn | full_turn,
            tree.diverged | sub_div,
            tree.sum_accept + s_acc,
            tree.num_leaves + leaves_done,
            key)

    tree = jax.lax.while_loop(doubling_cond, doubling_body, tree0)

    new_state = HMCState(tree.q_prop, tree.lp_prop, tree.grad_prop)
    stats = NutsStats(
        accept_prob=tree.sum_accept / jnp.maximum(tree.num_leaves, 1),
        num_leaves=tree.num_leaves,
        depth=tree.depth,
        diverged=tree.diverged,
        turned=tree.turning)
    return new_state, stats


def run_nuts(key: jax.Array, log_prob: Callable, theta0: jax.Array,
             num_samples: int, step_size: float = 0.1,
             max_tree_depth: int = 8):
    """Single-chain NUTS via lax.scan; returns (positions, log_probs, stats)."""
    init = hmc_init(log_prob, theta0)

    def step(state, k):
        new, stats = nuts_step(k, state, log_prob, step_size, max_tree_depth)
        return new, (new.position, new.log_prob, stats)

    keys = jax.random.split(key, num_samples)
    _, (qs, lps, stats) = jax.lax.scan(step, init, keys)
    return qs, lps, stats


def run_nuts_chains(key: jax.Array, log_prob: Callable, theta0: jax.Array,
                    num_samples: int, step_size: float = 0.1,
                    max_tree_depth: int = 8):
    """vmapped multi-chain NUTS; ``theta0``: (chains, dim).

    The chain axis is the ``particles`` mesh axis — shard ``theta0`` with
    ``NamedSharding(mesh, P("particles", None))`` and jit to scale chains
    across chips/hosts (same layout as run_hmc_chains).
    """
    chains = theta0.shape[0]
    keys = jax.random.split(key, chains)
    return jax.vmap(
        lambda k, t0: run_nuts(k, log_prob, t0, num_samples, step_size,
                               max_tree_depth)
    )(keys, theta0)


def nuts_warmup(key: jax.Array, log_prob: Callable, theta0: jax.Array,
                num_warmup: int = 100, target_accept: float = 0.8,
                init_step_size: float = 0.1, max_tree_depth: int = 8):
    """Dual-averaging step-size adaptation driving full NUTS transitions.

    Returns (adapted_step_size, warmed_state).
    """
    state0 = hmc_init(log_prob, theta0)
    mu = jnp.log(10.0 * init_step_size)

    def step(carry, k):
        state, log_eps, log_eps_avg, h_avg, t = carry
        state, stats = nuts_step(k, state, log_prob, jnp.exp(log_eps),
                                 max_tree_depth)
        t = t + 1.0
        h_avg = ((1 - 1 / (t + 10)) * h_avg
                 + (target_accept - stats.accept_prob) / (t + 10))
        log_eps = mu - jnp.sqrt(t) / 0.05 * h_avg
        w = t ** -0.75
        log_eps_avg = w * log_eps + (1 - w) * log_eps_avg
        return (state, log_eps, log_eps_avg, h_avg, t), stats.accept_prob

    keys = jax.random.split(key, num_warmup)
    (state, _, log_eps_avg, _, _), _ = jax.lax.scan(
        step, (state0, jnp.log(init_step_size), jnp.log(init_step_size),
               0.0, 0.0), keys)
    return jnp.exp(log_eps_avg), state
