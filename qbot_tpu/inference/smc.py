"""Sequential-Monte-Carlo particle ensembles: the device-side ProbVal.

The host-side :class:`~qbot_tpu.probval.ProbVal` keeps exact branch lists
(the conformance surface); this module is its scalable twin
(SURVEY.md §7 representation decision 2): a **weighted particle ensemble**
pytree with

* ``log_weights``: (B,) float array — the branch-probability axis,
* ``values``: any pytree whose leaves carry a leading (B,) batch axis.

ProbVal's cartesian-product lifting becomes ``vmap`` over the batch axis;
``normalize``'s renormalisation becomes log-weight normalisation; pruning
becomes resampling.  The batch axis is a mesh-shardable data-parallel axis
(``particles``), with weight reductions as ``psum`` collectives — this is
how probabilistic branching scales past one chip.

All functions are jit/shard_map-compatible: branch counts are static (pad
with -inf log-weights), no data-dependent shapes.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Ensemble", "from_probs", "normalize", "effective_sample_size",
           "systematic_resample", "resample_if_needed", "lift_vmap",
           "mix_to_density", "branch", "to_probval"]


class Ensemble(NamedTuple):
    """Weighted particle ensemble; the batch axis is shardable."""
    log_weights: jax.Array          # (B,)
    values: object                  # pytree, leaves (B, ...)

    @property
    def num_particles(self) -> int:
        return self.log_weights.shape[0]

    def weights(self) -> jax.Array:
        return jnp.exp(normalize(self.log_weights))


def from_probs(probs, values) -> Ensemble:
    lw = jnp.log(jnp.asarray(probs))
    return Ensemble(lw, values)


def normalize(log_weights: jax.Array, axis_name: str | None = None):
    """Log-normalise weights; with ``axis_name``, reduce across the mesh."""
    if axis_name is None:
        return log_weights - jax.scipy.special.logsumexp(log_weights)
    local = jax.scipy.special.logsumexp(log_weights)
    total = jax.lax.psum(jnp.exp(local), axis_name)
    return log_weights - jnp.log(total)


def effective_sample_size(log_weights: jax.Array) -> jax.Array:
    """ESS = 1 / Σ wᵢ² of the normalised weights."""
    lw = normalize(log_weights)
    return 1.0 / jnp.exp(jax.scipy.special.logsumexp(2.0 * lw))


def systematic_resample(key: jax.Array, ensemble: Ensemble) -> Ensemble:
    """Systematic resampling: low-variance, single uniform draw, jittable."""
    B = ensemble.num_particles
    w = ensemble.weights()
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ()) / B
    points = u0 + jnp.arange(B) / B
    idx = jnp.searchsorted(cum, points)
    idx = jnp.clip(idx, 0, B - 1)
    values = jax.tree.map(lambda v: v[idx], ensemble.values)
    return Ensemble(jnp.zeros(B) - jnp.log(B), values)


def resample_if_needed(key: jax.Array, ensemble: Ensemble,
                       threshold: float = 0.5) -> Ensemble:
    """Resample when ESS drops below threshold·B (branch-free via cond)."""
    ess = effective_sample_size(ensemble.log_weights)
    B = ensemble.num_particles

    def do(e):
        return systematic_resample(key, e)

    def skip(e):
        return Ensemble(normalize(e.log_weights), e.values)

    return jax.lax.cond(ess < threshold * B, do, skip, ensemble)


def lift_vmap(func: Callable, ensemble: Ensemble, *args) -> Ensemble:
    """The device-side funcWrapper: map func over every particle via vmap."""
    out = jax.vmap(lambda v: func(v, *args))(ensemble.values)
    return Ensemble(ensemble.log_weights, out)


def branch(ensemble: Ensemble, branch_log_probs: jax.Array,
           branch_values) -> Ensemble:
    """Fan every particle out over K outcomes (measurement / ProbVal spawn).

    ``branch_log_probs``: (B, K) per-particle outcome log-probabilities;
    ``branch_values``: pytree with leaves (B, K, ...).  Returns a B·K
    ensemble — the static-shape analogue of ProbVal's cartesian product.
    """
    B, K = branch_log_probs.shape
    lw = (ensemble.log_weights[:, None] + branch_log_probs).reshape(B * K)
    values = jax.tree.map(lambda v: v.reshape((B * K,) + v.shape[2:]),
                          branch_values)
    return Ensemble(lw, values)


def mix_to_density(ensemble: Ensemble, kets: jax.Array) -> jax.Array:
    """Σ wᵢ |ψᵢ⟩⟨ψᵢ| — fold a pure-state ensemble to one density matrix."""
    w = ensemble.weights()
    return jnp.einsum("b,bi,bj->ij", w, kets, jnp.conj(kets))


def to_probval(ensemble: Ensemble):
    """Collapse a small ensemble back to an exact host-side ProbVal."""
    import numpy as np

    from qbot_tpu.probval import ProbVal
    w = np.asarray(ensemble.weights())
    leaves = jax.tree.leaves(ensemble.values)
    vals = [np.asarray(leaf) for leaf in leaves]
    if len(vals) == 1:
        return ProbVal.from_unzipped(list(w), list(vals[0]))
    return ProbVal.from_unzipped(
        list(w), [tuple(v[i] for v in vals) for i in range(len(w))])
