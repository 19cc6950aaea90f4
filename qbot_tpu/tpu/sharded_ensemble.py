"""Mesh-sharded weighted particle ensembles: ProbVal + mid-circuit
measurement at multi-chip scale.

This is the module SURVEY.md §7 decision 2 calls for: the particle batch
``(B, 2, 2^n)`` of :mod:`qbot_tpu.inference.ensemble_exec` lives on a
2-D ``(particles, qubits)`` device mesh —

* the **particle axis** shards branches/outcome fan-outs (pure data
  parallelism; the scalable twin of the reference's ProbVal cartesian
  product, /root/reference/qbot/probVal.py:347-390);
* the **qubit axis** shards each particle's planar amplitude tensor over
  its leading physical qubit axes exactly like
  :mod:`qbot_tpu.tpu.sharded` (k = log2(qubit-shards)), so single
  particles larger than one chip's HBM still run.

Collapse events (``meas``/``disc`` anywhere in the program — reference
semantics /root/reference/qbot/operators.py:396-425,169-188) work at any
size: targets are first localized with ONE all_to_all
(:func:`qbot_tpu.tpu.sharded.plan_reshards_to_localize`), then the
outcome split is shard-local with the Born probabilities psummed over the
qubit axis, and the fan-out rides the particle axis.

Collective semantics:

* weight normalization — ``psum`` over the particle axis;
* outcome distributions — ``psum`` over qubits (per-particle Born
  probability), then ``psum`` over particles (mixture marginal);
* prune — per-particle-shard top-k quota (``max_particles / P`` each).
  This equals the global top-k whenever surviving branches spread evenly
  over shards; when they don't, MORE mass may be dropped than a global
  top-k would drop — but ``lost_mass`` accumulates the mass *actually*
  dropped (psummed), so the reported total-variation bound stays exact;
* SMC resampling — island-model local systematic resampling: each
  particle shard resamples within itself and keeps its island weight
  (unbiased; standard distributed SMC).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qbot_tpu.tpu.sharded import (
    BitSwap,
    LocalPerm,
    LocalSegment,
    Reshard,
    ShardedDiag,
    ShardedFlip,
    ShardedPlan,
    ShardedReflect,
    _shard_map,
    apply_bitswap_local,
)

__all__ = ["EnsembleMesh", "ShardedEnsemble", "init_sharded_ensemble",
           "init_product_sharded_ensemble",
           "apply_sharded_plan_ensemble", "measure_fanout_sharded",
           "discard_fanout_sharded", "measure_sample_sharded",
           "discard_sample_sharded", "peek_probs_sharded",
           "replace_sample_sharded", "resample_down_sharded",
           "prune_sharded", "concat_sharded", "maybe_exchange_islands",
           "island_log_weights",
           "gather_ensemble", "sharded_ensemble_mixture"]


def _count(stats, n: int) -> None:
    """Executor-side collective accounting (VERDICT r3 weak #4): each
    executor adds the number of collective ops its traced computation
    actually contains — counted where they are emitted, not estimated by
    the caller.  Counts are per collective OP (a psum over the particle
    axis is one op however many particles ride it)."""
    if stats is not None:
        stats["num_collectives"] = stats.get("num_collectives", 0) + n

_NEG = -1e30          # dead-particle log-weight (exp underflows to 0)
_MIN_P = 1e-12

# Cached jitted executors.  Every executor builds its shard_map body as a
# fresh closure, so a bare jax.jit(mapped) RE-TRACES on every call — a
# real fraction of the measured 1.59x sharded-vs-unsharded overhead at
# 24q (SCALING_r04 anchor).  The cache key carries every closure static
# (sizes, targets, mode, mesh, axis names, dtype), so two closures with
# the same key trace identical computations; anything dynamic (arrays,
# PRNG keys) is an argument of the mapped function.
_JIT_CACHE: dict = {}


# Register-shrinking executors (disc) donate inputs their outputs cannot
# alias; jax warns "Some donated buffers were not usable" at trace time
# even though the donation still frees the buffer early (the point).
# Expected here by design — silence just that message.
import warnings as _warnings

_warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable")


def _cached_jit(key, mapped, donate_argnums=()):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(mapped, donate_argnums=tuple(donate_argnums))
        _JIT_CACHE[key] = fn
    return fn


def _mesh_key(emesh: EnsembleMesh):
    return (emesh.mesh, emesh.p_axis, emesh.q_axis)


def _boundary_reshape(x, shape, donate: bool):
    """Jitted (optionally donating) reshape for executor jit boundaries.

    The flat↔5-D-carrier conversions around the sample-mode executors
    are relayout COPIES on TPU; doing them eagerly keeps both buffers
    live (+1 ensemble of peak HBM per conversion) and re-traces nothing.
    A donated jitted reshape frees the source immediately.
    """
    ck = ("br", x.shape, tuple(shape), x.dtype, bool(donate), x.sharding)
    fn = _JIT_CACHE.get(ck)
    if fn is None:
        fn = jax.jit(lambda a: a.reshape(shape),
                     donate_argnums=(0,) if donate else ())
        _JIT_CACHE[ck] = fn
    return fn(x)


@dataclass(frozen=True)
class EnsembleMesh:
    """A (particles × qubit-shards) mesh view for ensemble execution."""
    mesh: Mesh
    p_axis: str = "particles"
    q_axis: str = "qubits"

    @property
    def P(self) -> int:
        return int(dict(self.mesh.shape)[self.p_axis])

    @property
    def K(self) -> int:
        return int(dict(self.mesh.shape)[self.q_axis])

    @property
    def k(self) -> int:
        return int(self.K).bit_length() - 1

    def specs(self, q_sharded: bool = True):
        """(log_w spec, psi spec).  ``q_sharded=False`` replicates each
        register over the qubit axis — the fallback for registers too
        small to shard (n < 2k); the particle axis still parallelises."""
        if q_sharded:
            return (P(self.p_axis), P(self.p_axis, None, self.q_axis))
        return (P(self.p_axis), P(self.p_axis, None, None))


class ShardedEnsemble(NamedTuple):
    """Weighted particle batch on the mesh (see module docstring).

    ``log_w``: (B,) sharded over particles; ``psi``: (B, 2, 2^n) sharded
    over (particles, qubits); ``lost_mass``: replicated scalar — the
    cumulative pruned-probability TV bound, exactly as in
    :class:`qbot_tpu.inference.ensemble_exec.QuantumEnsemble`.
    """
    log_w: jax.Array
    psi: jax.Array
    lost_mass: jax.Array | float = 0.0

    @property
    def num_particles(self) -> int:
        return self.log_w.shape[0]


def _pad_batch(log_w: np.ndarray, psi: np.ndarray, multiple: int):
    B = log_w.shape[0]
    rem = (-B) % multiple
    if rem:
        log_w = np.concatenate([log_w, np.full((rem,), _NEG, log_w.dtype)])
        psi = np.concatenate(
            [psi, np.zeros((rem,) + psi.shape[1:], psi.dtype)])
    return log_w, psi


def init_sharded_ensemble(psi0, emesh: EnsembleMesh,
                          log_w=None,
                          q_sharded: bool = True) -> ShardedEnsemble:
    """Place a host batch of planar states on the mesh.

    ``psi0``: (2, 2^n) single state or (B, 2, 2^n) batch; ``log_w``
    defaults to uniform over the given batch.  The batch is padded with
    dead (zero-weight) particles to a multiple of the particle-shard
    count so per-shard shapes stay static.
    """
    psi0 = np.asarray(psi0, np.float32)
    if psi0.ndim == 2:
        psi0 = psi0[None]
    B = psi0.shape[0]
    lw = (np.full((B,), -np.log(B), np.float32) if log_w is None
          else np.asarray(log_w, np.float32))
    lw, psi0 = _pad_batch(lw, psi0, emesh.P)
    spec_w, spec_psi = emesh.specs(q_sharded)
    return ShardedEnsemble(
        jax.device_put(jnp.asarray(lw), NamedSharding(emesh.mesh, spec_w)),
        jax.device_put(jnp.asarray(psi0),
                       NamedSharding(emesh.mesh, spec_psi)),
        0.0)


def init_product_sharded_ensemble(kets, emesh: EnsembleMesh, B: int = 1,
                                  q_sharded: bool = True
                                  ) -> ShardedEnsemble:
    """Uniform B-particle ensemble of the product state ⊗kets, built ON
    DEVICE directly into the mesh sharding.

    The round-4 anchor spent ~22 of its 24 s wall moving the initial
    ensemble through the axon host↔device tunnel (128 MB device_put +
    128 MB pull-back + 1 GB re-upload for SMC replication — measured in
    benchmarks/diag_anchor_tx.py at ~60 MB/s up / ~22 MB/s down), while
    building the same arrays on-device takes ~50 ms.  This constructor
    jits the kron chain + particle tile with ``out_shardings`` so the
    state materialises sharded in HBM and never exists on the host.

    ``B`` is padded with dead (weight-0) particles to a multiple of the
    particle-shard count; dead rows carry copies of the state (their
    weight annihilates every contribution, same as zero rows).
    """
    from qbot_tpu.tpu.planar import (
        _DEVICE_BUILD_MIN_DIM,
        product_state_planar,
        to_planar,
    )

    kets = [np.asarray(k, np.complex128).ravel() for k in kets]
    dim = 1
    for kt in kets:
        dim *= kt.shape[0]
    if dim < _DEVICE_BUILD_MIN_DIM:
        flat = np.array([1.0 + 0j])
        for kt in kets:
            flat = np.kron(flat, kt)
        flat = flat / np.linalg.norm(flat)
        psi0 = np.broadcast_to(to_planar(flat), (B, 2, dim))
        lw = np.full((B,), -np.log(B), np.float32)
        return init_sharded_ensemble(psi0, emesh, log_w=lw,
                                     q_sharded=q_sharded)

    B_pad = B + (-B) % emesh.P
    spec_w, spec_psi = emesh.specs(q_sharded)
    psi1 = product_state_planar(kets)        # (2, dim) on device
    ck = ("ip", B_pad, dim, _mesh_key(emesh), q_sharded)
    fn = _JIT_CACHE.get(ck)
    if fn is None:
        fn = jax.jit(
            lambda p: jnp.broadcast_to(p[None], (B_pad, 2, dim)),
            out_shardings=NamedSharding(emesh.mesh, spec_psi))
        _JIT_CACHE[ck] = fn
    psi = fn(psi1)
    lw = np.concatenate([np.full((B,), -np.log(B), np.float32),
                         np.full((B_pad - B,), _NEG, np.float32)])
    log_w = jax.device_put(jnp.asarray(lw),
                           NamedSharding(emesh.mesh, spec_w))
    return ShardedEnsemble(log_w, psi, 0.0)


# ---------------------------------------------------------------------------
# batched shard-local plan application (the qubit-axis executor of
# tpu/sharded.py with a leading local-particle axis)
# ---------------------------------------------------------------------------

def _apply_items_batched(psi, params, splan: ShardedPlan, q_axis: str):
    """psi: local (Bl, 2, 2^(n-k)) block; applies every plan item."""
    from qbot_tpu.tpu.planar import apply_plan_planar

    n, k = splan.n, splan.k
    K = 2**k
    n_local = n - k

    for item in splan.items:
        if isinstance(item, LocalSegment):
            # no Pallas inside shard_map (see tpu/sharded.py note); the
            # dot/XLA paths serve local segments on every backend
            from qbot_tpu.tpu import kernels as _k

            _prev = _k.kernel_mode()
            _k.set_kernel_mode("off")
            try:
                psi = jax.vmap(
                    lambda p: apply_plan_planar(p, item.plan, params))(psi)
            finally:
                _k.set_kernel_mode(_prev)
        elif isinstance(item, ShardedFlip):
            here = jax.lax.axis_index(q_axis) == item.owner
            sign = jnp.where(here, -1.0, 1.0).astype(psi.dtype)
            psi = psi.at[:, :, item.local_index].multiply(sign)
        elif isinstance(item, ShardedDiag):
            psi = _batched_sharded_diag(psi, item, n_local, k, q_axis)
        elif isinstance(item, ShardedReflect):
            psi = _batched_sharded_reflect(psi, item, k, q_axis)
        elif isinstance(item, LocalPerm):
            Bl = psi.shape[0]
            t = psi.reshape((Bl, 2) + (2,) * n_local)
            t = jnp.transpose(t, (0, 1) + tuple(2 + a for a in item.order))
            psi = t.reshape(psi.shape)
        elif isinstance(item, BitSwap):
            psi = apply_bitswap_local(psi, item, n_local, k, q_axis)
        else:                            # Reshard
            Bl = psi.shape[0]
            pre = 2 ** (item.m - k)
            post = 2 ** (n - item.m - k)
            t = psi.reshape(Bl, 2, pre, K, post)
            t = jax.lax.all_to_all(t, q_axis, split_axis=3,
                                   concat_axis=3, tiled=True)
            psi = t.reshape(Bl, 2, 2**n_local)
    return psi


def _batched_sharded_diag(psi, item: ShardedDiag, n_local: int, k: int,
                          q_axis: str):
    S = len(item.positions)
    dev = jax.lax.axis_index(q_axis)
    dr = jnp.asarray(item.diag.real.reshape((2,) * S), psi.dtype)
    di = jnp.asarray(item.diag.imag.reshape((2,) * S), psi.dtype)
    local_axes = []
    for ax in range(S - 1, -1, -1):
        p = item.positions[ax]
        if p < k:
            bit = (dev >> (k - 1 - p)) & 1
            dr = jnp.take(dr, bit, axis=ax)
            di = jnp.take(di, bit, axis=ax)
        else:
            local_axes.append(p - k)
    local_axes.reverse()
    order = list(np.argsort(local_axes))
    if local_axes:
        dr = jnp.transpose(dr, order)
        di = jnp.transpose(di, order)
    shape = [1] * n_local
    for a in local_axes:
        shape[a] = 2
    Bl = psi.shape[0]
    if n_local >= 14:
        # tiling-safe carrier formulation (see tpu/sharded.py note)
        from qbot_tpu.inference.ensemble_exec import _carrier

        F, S, L = _carrier(n_local)
        drc = jnp.broadcast_to(dr.reshape(shape),
                               (2,) * n_local).reshape(1, F, S, L)
        dic = jnp.broadcast_to(di.reshape(shape),
                               (2,) * n_local).reshape(1, F, S, L)
        t = psi.reshape(Bl, 2, F, S, L)
        pr, pi = t[:, 0], t[:, 1]
        out_r = drc * pr - dic * pi
        out_i = drc * pi + dic * pr
        return jnp.stack([out_r, out_i], axis=1).reshape(psi.shape)
    dr = dr.reshape([1] + shape)         # broadcast over the particle axis
    di = di.reshape([1] + shape)
    t = psi.reshape((Bl, 2) + (2,) * n_local)
    pr, pi = t[:, 0], t[:, 1]
    out_r = dr * pr - di * pi
    out_i = dr * pi + di * pr
    return jnp.stack([out_r, out_i], axis=1).reshape(psi.shape)


def _batched_sharded_reflect(psi, item: ShardedReflect, k: int,
                             q_axis: str):
    """Per-particle ψ → ψ − 2⟨v|ψ⟩v; one psum of (Bl,) complex partials."""
    dev = jax.lax.axis_index(q_axis)
    sr = jnp.asarray(1.0, psi.dtype)
    si = jnp.asarray(0.0, psi.dtype)
    for p, f in enumerate(item.shard_factors):
        bit = (dev >> (k - 1 - p)) & 1
        fr = jnp.asarray(np.real(f), psi.dtype)[bit]
        fi = jnp.asarray(np.imag(f), psi.dtype)[bit]
        sr, si = sr * fr - si * fi, sr * fi + si * fr

    Bl = psi.shape[0]
    t = psi                                # (Bl, 2, L)
    for f in item.local_factors:
        fr = jnp.asarray(np.real(f), psi.dtype)
        fi = jnp.asarray(np.imag(f), psi.dtype)
        W = jnp.stack([jnp.stack([fr, fi]), jnp.stack([-fi, fr])])
        t = jnp.einsum("acx,bcxr->bar", W, t.reshape(Bl, 2, 2, -1),
                       precision=jax.lax.Precision.HIGHEST)
    cr, ci = t[:, 0, 0], t[:, 1, 0]        # (Bl,)
    gr = jax.lax.psum(sr * cr + si * ci, q_axis)
    gi = jax.lax.psum(sr * ci - si * cr, q_axis)

    nl = len(item.local_factors)
    vr = jnp.asarray(1.0, psi.dtype)
    vi = jnp.asarray(0.0, psi.dtype)
    for ax, f in enumerate(item.local_factors):
        shape = [1] * nl
        shape[ax] = 2
        br = jnp.asarray(np.real(f), psi.dtype).reshape(shape)
        bi = jnp.asarray(np.imag(f), psi.dtype).reshape(shape)
        vr, vi = vr * br - vi * bi, vr * bi + vi * br
    ar = 2.0 * (gr * sr - gi * si)         # (Bl,)
    ai = 2.0 * (gr * si + gi * sr)
    bshape = (Bl,) + (1,) * nl
    tshape = (Bl,) + (2,) * nl
    pr = psi[:, 0].reshape(tshape)
    pi = psi[:, 1].reshape(tshape)
    arb = ar.reshape(bshape)
    aib = ai.reshape(bshape)
    out_r = pr - (arb * vr - aib * vi)
    out_i = pi - (arb * vi + aib * vr)
    return jnp.stack([out_r.reshape(Bl, -1), out_i.reshape(Bl, -1)], axis=1)


def apply_sharded_plan_ensemble(ens: ShardedEnsemble, splan: ShardedPlan,
                                emesh: EnsembleMesh,
                                params=None,
                                donate: bool = False) -> ShardedEnsemble:
    """Run a qubit-sharded plan over every particle (no collectives on the
    particle axis; reshards/psums ride the qubit axis only).

    ``donate=True`` donates the input state buffer — halves the
    executor's live HBM (in + out ensembles) for callers that drop the
    old ensemble (the runner's segment path); never pass it when the
    input is still referenced (e.g. a peek's rotation copy).
    """
    spec_w, spec_psi = emesh.specs(q_sharded=splan.k > 0)

    def body(psi, prm):
        return _apply_items_batched(psi, prm, splan, emesh.q_axis)

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_psi, P()), out_specs=spec_psi)
    if params is None:
        params = jnp.zeros((max(splan.num_params, 1),), ens.psi.dtype)
    from qbot_tpu.tpu import kernels
    from qbot_tpu.tpu.sharded import splan_cache_key

    dons = (0,) if donate else ()
    digest = splan_cache_key(splan)
    if digest is None:                 # parameterised plan: not cacheable
        psi = jax.jit(mapped, donate_argnums=dons)(ens.psi, params)
    else:
        ck = ("ap", digest, _mesh_key(emesh), ens.psi.shape,
              ens.psi.dtype, kernels.dot_mode(), donate)
        psi = _cached_jit(ck, mapped, dons)(ens.psi, params)
    return ShardedEnsemble(ens.log_w, psi, ens.lost_mass)


# ---------------------------------------------------------------------------
# collapse events: measurement / discard fan-out on the mesh
# ---------------------------------------------------------------------------

def _global_normalize(log_w, p_axis):
    """log_w − log Σ_global exp(log_w) via a psum-logsumexp."""
    m_local = jnp.max(log_w)
    m = jax.lax.pmax(m_local, p_axis)
    z = jax.lax.psum(jnp.sum(jnp.exp(log_w - m)), p_axis)
    return log_w - (m + jnp.log(z))


def _shard_outcome_index(shard_positions: Sequence[int], k: int,
                         q_axis: str):
    """This device's outcome bits for targets living on sharded axes —
    the measurement of a sharded qubit reads the device id, no data
    movement at all (MSB-first over ascending shard positions)."""
    dev = jax.lax.axis_index(q_axis)
    t_s = len(shard_positions)
    os = jnp.zeros((), jnp.int32)
    for i, pp in enumerate(shard_positions):
        bit = (dev >> (k - 1 - pp)) & 1
        os = os | (bit.astype(jnp.int32) << (t_s - 1 - i))
    return os


def _outcome_split_local(psi, n_local: int, targets: Sequence[int],
                         q_axis: str, shard_positions: Sequence[int] = (),
                         k: int = 0, q_sharded: bool = True):
    """Shard-local block of ensemble_exec._outcome_split, generalised to
    targets on BOTH local and sharded axes.

    psi: (2, 2^n_local).  Local ``targets`` split into K_l blocks as on a
    single device; sharded targets contribute device-id bits: this shard
    holds amplitude only for outcomes whose sharded bits equal its own, so
    its probabilities/states scatter at offset ``os·K_l`` and every other
    outcome row is zero (the projection masks whole shards — zero
    communication beyond the probability psum).  Outcome bit order:
    sharded targets (ascending physical position) then local targets
    (ascending axis), MSB-first; probabilities psum over the qubit axis;
    collapsed states normalised by GLOBAL p.
    """
    from qbot_tpu.inference.ensemble_exec import (
        _carrier,
        _outcome_mask,
        _probs_by_reduce,
        _safe_layouts,
    )

    targets = sorted(targets)
    t = len(targets)
    K_l = 2**t
    K = K_l * 2 ** len(shard_positions)
    safe = _safe_layouts(n_local, t)
    if safe:
        # tiling-safe path (see ensemble_exec): grouped-view reduction
        # for the probabilities, diagonal bit masks for the projections
        p_l = _probs_by_reduce(psi, n_local, targets)
    else:
        pt = psi.reshape((2,) + (2,) * n_local)
        pt = jnp.moveaxis(pt, [1 + q for q in targets],
                          list(range(1, 1 + t)))
        pt = pt.reshape(2, K_l, -1)
        p_l = jnp.sum(pt**2, axis=(0, 2))                     # (K_l,)
    if shard_positions:
        os = _shard_outcome_index(shard_positions, k, q_axis)
        rows = os * K_l + jnp.arange(K_l)
        p = jax.lax.psum(
            jnp.zeros((K,), p_l.dtype).at[rows].set(p_l), q_axis)
        my_p = p[rows]
    elif q_sharded:
        p = jax.lax.psum(p_l, q_axis)                         # global (K,)
        my_p = p
    else:
        p = p_l                       # register replicated over the q axis
        my_p = p
    if safe:
        F, S, L = _carrier(n_local)
        inv = 1.0 / jnp.sqrt(jnp.clip(my_p, _MIN_P))
        pv = psi.reshape(2, F, S, L)
        proj = jnp.stack([pv * (_outcome_mask(n_local, targets, kk)
                                * inv[kk])
                          for kk in range(K_l)]).reshape(K_l, 2, -1)
    else:
        eye = jnp.eye(K_l, dtype=psi.dtype)
        proj = jnp.einsum("kj,cjr->kcjr", eye, pt)
        norm = jnp.sqrt(jnp.clip(my_p, _MIN_P))[:, None, None, None]
        proj = proj / norm
        proj = proj.reshape((K_l, 2) + (2,) * n_local)
        proj = jnp.moveaxis(proj, list(range(2, 2 + t)),
                            [2 + q for q in targets])
        proj = proj.reshape(K_l, 2, -1)
    if shard_positions:
        proj = jnp.zeros((K,) + proj.shape[1:], proj.dtype
                         ).at[rows].set(proj)
    return p, proj


def _outcome_probs_local(psi, n_local: int, targets: Sequence[int],
                         q_axis: str, shard_positions: Sequence[int] = (),
                         k: int = 0, q_sharded: bool = True):
    """Outcome probabilities only (no states): (global p (K,), my_p).

    The probs part of :func:`_outcome_split_local`, for sample-mode
    collapses that select ONE outcome's mask per particle instead of
    materialising all K projections (K× the ensemble memory — OOMs at
    24 qubits)."""
    from qbot_tpu.inference.ensemble_exec import _probs_by_reduce

    targets = sorted(targets)
    K_l = 2 ** len(targets)
    K = K_l * 2 ** len(shard_positions)
    p_l = _probs_by_reduce(psi, n_local, targets)
    if shard_positions:
        os = _shard_outcome_index(shard_positions, k, q_axis)
        rows = os * K_l + jnp.arange(K_l)
        p = jax.lax.psum(
            jnp.zeros((K,), p_l.dtype).at[rows].set(p_l), q_axis)
        my_p = p[rows]
    elif q_sharded:
        p = jax.lax.psum(p_l, q_axis)
        my_p = p
    else:
        p = p_l
        my_p = p
    return p, my_p


def _discard_split_local(psi, n_local: int, targets: Sequence[int],
                         q_axis: str, q_sharded: bool = True):
    """Shard-local ensemble_exec._discard_split (global-normalised)."""
    from qbot_tpu.inference.ensemble_exec import (
        _carrier,
        _outcome_mask,
        _probs_by_reduce,
        _safe_layouts,
        _sum_over_targets,
    )

    targets = sorted(targets)
    t = len(targets)
    K = 2**t
    if _safe_layouts(n_local, t):
        F, S, L = _carrier(n_local)
        p = _probs_by_reduce(psi, n_local, targets)
        if q_sharded:
            p = jax.lax.psum(p, q_axis)
        inv = 1.0 / jnp.sqrt(jnp.clip(p, _MIN_P))
        pv = psi.reshape(2, F, S, L)
        states = jnp.stack([
            _sum_over_targets(
                (pv * (_outcome_mask(n_local, targets, kk) * inv[kk])
                 ).reshape(2, -1), n_local, targets)
            for kk in range(K)])
        return p, states
    pt = psi.reshape((2,) + (2,) * n_local)
    pt = jnp.moveaxis(pt, [1 + q for q in targets], list(range(1, 1 + t)))
    pt = pt.reshape(2, K, -1)
    p = jnp.sum(pt**2, axis=(0, 2))
    if q_sharded:
        p = jax.lax.psum(p, q_axis)
    norm = jnp.sqrt(jnp.clip(p, _MIN_P))[None, :, None]
    states = jnp.moveaxis(pt / norm, 1, 0)
    return p, states


def _replace_block_local(state, n_local: int, targets: Sequence[int],
                         k_out: int):
    """ensemble_exec._replace_block on the shard-local view (targets are
    local axes; the collapsed block structure lives entirely locally —
    delegates to the tiling-safe shared implementation)."""
    from qbot_tpu.inference.ensemble_exec import _replace_block

    return _replace_block(state, n_local, targets, k_out)


def _quota(B_total: int, K_fan: int, max_particles: int, Pshards: int):
    """(new local batch, whether a prune happens) — decided host-side."""
    grown = B_total * K_fan
    if grown <= max_particles:
        return grown // Pshards, False
    keep = max(Pshards, (max_particles // Pshards) * Pshards)
    return keep // Pshards, True


def _prune_local(log_w, psi, quota: int, lost_mass, p_axis):
    """Per-shard top-``quota`` + global renormalise; lost_mass accumulates
    the ACTUAL globally-dropped mass (exact bound even though the
    selection quota is per-shard)."""
    total = log_w.shape[0]
    if quota < total:
        mass_before = jax.lax.psum(jnp.sum(jnp.exp(log_w)), p_axis)
        log_w, idx = jax.lax.top_k(log_w, quota)
        psi = psi[idx]
        mass_after = jax.lax.psum(jnp.sum(jnp.exp(log_w)), p_axis)
        dropped = 1.0 - mass_after / jnp.clip(mass_before, _MIN_P)
        lost_mass = lost_mass + (1.0 - lost_mass) * dropped
    log_w = _global_normalize(log_w, p_axis)
    return log_w, psi, lost_mass


def measure_fanout_sharded(ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           emesh: EnsembleMesh,
                           max_particles: int = 256,
                           mode: str = "reference",
                           shard_positions: Sequence[int] = (),
                           q_sharded: bool = True,
                           stats: Optional[dict] = None
                           ) -> tuple[ShardedEnsemble, jax.Array]:
    """Mesh twin of :func:`ensemble_exec.measure_fanout`.

    ``local_targets`` are LOCAL physical axes of the (n−k)-qubit shard
    block; ``shard_positions`` are target physical positions < k whose
    outcome bit is the device id (zero-communication measurement).
    ``mode="reference"`` (the decoupling semantics) relocates outcome
    blocks, which needs locality — pass shard targets only with
    ``projective`` (the caller falls back to localization or, for
    all-qubit measurements where the two modes coincide, projective).
    Fan-out is K-way (projective) or K²-way (reference) on the particle
    axis; returns (pruned ensemble, outcome distribution).
    """
    if mode == "reference" and shard_positions:
        raise ValueError("reference-mode collapse needs localized targets")
    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    K = 2 ** (len(local_targets) + len(shard_positions))
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    fan = K * K if mode == "reference" else K
    new_local, _ = _quota(B_total, fan, max_particles, emesh.P)
    # traced collectives: outcome-probability psum (qubit axis, absent
    # only for a replicated register with no shard targets), weight
    # normalize (pmax+psum), mixture-marginal psum, prune mass psums
    # (only when the quota actually cuts), post-prune normalize
    _count(stats, (1 if (shard_positions or q_sharded) else 0) + 2 + 1
           + (2 if new_local < (B_total // emesh.P) * fan else 0) + 2)

    def body(log_w, psi, lost):
        p_all, states = jax.vmap(
            lambda s: _outcome_split_local(s, n_local, local_targets,
                                           emesh.q_axis, shard_positions,
                                           k, q_sharded))(psi)
        lw_n = _global_normalize(log_w, emesh.p_axis)
        w = jnp.exp(lw_n)
        dist = jax.lax.psum(w @ p_all, emesh.p_axis)
        logp = jnp.log(jnp.clip(p_all, _MIN_P))

        if mode == "projective":
            new_lw = (log_w[:, None] + logp).reshape(Bl * K)
            new_psi = states.reshape((Bl * K, 2) + states.shape[3:])
        elif mode == "reference":
            relocated = jax.vmap(jax.vmap(
                lambda s: jax.vmap(
                    lambda ko: _replace_block_local(s, n_local,
                                                    local_targets, ko)
                )(jnp.arange(K))))(states)          # (Bl, K_j, K_k, 2, ·)
            new_lw = (log_w[:, None, None] + logp[:, :, None]
                      + logp[:, None, :]).reshape(Bl * K * K)
            new_psi = relocated.reshape((Bl * K * K, 2) + states.shape[3:])
        else:
            raise ValueError(f"unknown collapse mode {mode!r}")

        new_lw, new_psi, lost = _prune_local(new_lw, new_psi, new_local,
                                             lost, emesh.p_axis)
        return new_lw, new_psi, lost, dist

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P(), P()))
    ck = ("mf", n, tuple(sorted(local_targets)), tuple(shard_positions),
          q_sharded, mode, B_total, max_particles, _mesh_key(emesh),
          ens.psi.dtype)
    log_w, psi, lost, dist = _cached_jit(ck, mapped)(
        ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost), dist


def discard_fanout_sharded(ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           emesh: EnsembleMesh,
                           max_particles: int = 256,
                           q_sharded: bool = True,
                           stats: Optional[dict] = None) -> ShardedEnsemble:
    """Mesh twin of :func:`ensemble_exec.discard_fanout`: the register
    SHRINKS by len(local_targets) qubits (all local axes — localize
    first); the sharded axes stay, so the result is a reduced sharded
    ψ-ensemble (the sharded partial trace / register shrink)."""
    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    K = 2 ** len(local_targets)
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    new_local, _ = _quota(B_total, K, max_particles, emesh.P)
    _count(stats, (1 if q_sharded else 0)
           + (2 if new_local < Bl * K else 0) + 2)

    def body(log_w, psi, lost):
        p_all, states = jax.vmap(
            lambda s: _discard_split_local(s, n_local, local_targets,
                                           emesh.q_axis, q_sharded))(psi)
        logp = jnp.log(jnp.clip(p_all, _MIN_P))
        new_lw = (log_w[:, None] + logp).reshape(Bl * K)
        new_psi = states.reshape((Bl * K, 2) + states.shape[3:])
        new_lw, new_psi, lost = _prune_local(new_lw, new_psi, new_local,
                                             lost, emesh.p_axis)
        return new_lw, new_psi, lost

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    log_w, psi, lost = jax.jit(mapped)(
        ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def replace_fanout_sharded(ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           new_states,
                           emesh: EnsembleMesh,
                           max_particles: int = 256,
                           q_sharded: bool = True,
                           stats: Optional[dict] = None) -> ShardedEnsemble:
    """Mesh twin of :func:`ensemble_exec.replace_fanout` (targeted qset).

    ``local_targets`` are LOCAL physical axes (localize first — the
    caller reshards the targets off the sharded axes), so both the
    partial trace's fan-out and the tensor insertion are shard-local;
    the only collective is the Born-probability psum of the trace.  The
    physical positions are re-populated in place, so the caller's
    qubit permutation is unchanged.  ``new_states``: ((weight, planar
    2×2^t ket), …) eigen-branches of the new state.
    """
    from qbot_tpu.inference.ensemble_exec import _insert_block

    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    t = len(local_targets)
    K = 2 ** t
    NB = len(new_states)
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    new_local, _ = _quota(B_total, K * NB, max_particles, emesh.P)
    _count(stats, (1 if q_sharded else 0)
           + (2 if new_local < Bl * K * NB else 0) + 2)
    phis = [(float(w), np.asarray(phi, np.float32))
            for w, phi in new_states]

    def body(log_w, psi, lost):
        p_all, states = jax.vmap(
            lambda s: _discard_split_local(s, n_local, local_targets,
                                           emesh.q_axis, q_sharded))(psi)
        logp = jnp.log(jnp.clip(p_all, _MIN_P))
        parts_w, parts_psi = [], []
        for wb, phi in phis:
            ins = jax.vmap(jax.vmap(
                lambda s: _insert_block(jnp.asarray(phi, psi.dtype), s,
                                        n_local, list(local_targets))
            ))(states)
            parts_psi.append(ins.reshape((Bl * K, 2, -1)))
            parts_w.append((log_w[:, None] + logp
                            + np.log(wb)).reshape(Bl * K))
        new_lw = jnp.concatenate(parts_w)
        new_psi = jnp.concatenate(parts_psi)
        new_lw, new_psi, lost = _prune_local(new_lw, new_psi, new_local,
                                             lost, emesh.p_axis)
        return new_lw, new_psi, lost

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    ck = ("rf", n, tuple(local_targets), q_sharded, B_total,
          max_particles, _mesh_key(emesh), ens.psi.dtype,
          tuple((float(w), np.asarray(phi).tobytes())
                for w, phi in new_states))
    log_w, psi, lost = _cached_jit(ck, mapped)(
        ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def peek_probs_sharded(ens: ShardedEnsemble, n: int,
                       local_targets: Sequence[int],
                       emesh: EnsembleMesh,
                       shard_positions: Sequence[int] = (),
                       q_sharded: bool = True,
                       stats: Optional[dict] = None) -> jax.Array:
    """Mixture-marginal outcome distribution, no state change."""
    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    _count(stats, (1 if (shard_positions or q_sharded) else 0) + 2 + 1)

    def body(log_w, psi):
        p_all, _ = jax.vmap(
            lambda s: _outcome_split_local(s, n_local, local_targets,
                                           emesh.q_axis, shard_positions,
                                           k, q_sharded))(psi)
        w = jnp.exp(_global_normalize(log_w, emesh.p_axis))
        return jax.lax.psum(w @ p_all, emesh.p_axis)

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_w, spec_psi), out_specs=P())
    ck = ("pk", n, tuple(sorted(local_targets)), tuple(shard_positions),
          q_sharded, ens.num_particles, _mesh_key(emesh), ens.psi.dtype)
    return _cached_jit(ck, mapped)(ens.log_w, ens.psi)


# ---------------------------------------------------------------------------
# SMC (sampled) collapse: constant particle count, island resampling
# ---------------------------------------------------------------------------

def _island_resample(key, log_w, values_psi, ess_frac, p_axis,
                     threshold: float = 0.5):
    """Local systematic resampling within each particle shard, triggered
    by the GLOBAL effective sample size.  Each island keeps its total
    weight (redistributed uniformly over its particles) — the standard
    unbiased island-particle-filter scheme; islands never exchange
    particles, so no cross-shard state movement."""
    Bl = log_w.shape[0]

    def do(_):
        m = jnp.max(log_w)
        w = jnp.exp(log_w - m)
        tot = jnp.sum(w)
        wn = w / jnp.clip(tot, _MIN_P)
        u = (jax.random.uniform(key, ()) + jnp.arange(Bl)) / Bl
        idx = jnp.searchsorted(jnp.cumsum(wn), u)
        idx = jnp.clip(idx, 0, Bl - 1)
        island_log = m + jnp.log(jnp.clip(tot, _MIN_P))   # island weight
        new_lw = jnp.full((Bl,), island_log - np.log(Bl), log_w.dtype)
        return new_lw, values_psi[idx]

    def skip(_):
        return log_w, values_psi

    return jax.lax.cond(ess_frac < threshold, do, skip, None)


def _pre_digest(pre_plan):
    """Digest of an optional fused pre-plan, or raises ValueError when it
    is not content-addressable (callers fall back to separate calls)."""
    if pre_plan is None:
        return None
    from qbot_tpu.tpu.sharded import splan_cache_key

    d = splan_cache_key(pre_plan)
    if d is None:
        raise ValueError("pre_plan with parameterised makers cannot fuse")
    return d


def measure_sample_sharded(key, ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           emesh: EnsembleMesh,
                           ess_threshold: float = 0.5,
                           shard_positions: Sequence[int] = (),
                           q_sharded: bool = True,
                           stats: Optional[dict] = None,
                           donate: bool = False,
                           pre_plan=None,
                           post_plan=None
                           ) -> tuple[ShardedEnsemble, jax.Array]:
    """SMC-mode measurement on the mesh: each particle SAMPLES one outcome
    from its own (qubit-psummed) Born distribution — the optimal proposal,
    so weights are untouched; island resampling triggers on global ESS.

    The per-particle PRNG key is folded with the GLOBAL particle index so
    every qubit shard of the same particle draws the same outcome.

    ``pre_plan`` / ``post_plan``: optional content-addressable
    :class:`~qbot_tpu.tpu.sharded.ShardedPlan` applied to every particle
    INSIDE the jitted body before / after the collapse — the runner
    fuses [gate segment + localization reshards + basis rotation] →
    collapse → [inverse rotation] into ONE jitted shard_map call per
    event (one dispatch, no inter-call boundary copies); VERDICT r4 #1's
    prescription.  The plans must not change the register width.
    """
    spec_w, spec_psi = emesh.specs(q_sharded)
    pre_d = _pre_digest(pre_plan)
    post_d = _pre_digest(post_plan)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    _count(stats, (1 if (shard_positions or q_sharded) else 0) + 2 + 1 + 2)

    from qbot_tpu.inference.ensemble_exec import _carrier, _safe_layouts

    t_l = len(sorted(local_targets))
    K_l = 2 ** t_l
    safe = _safe_layouts(n_local, t_l)

    def body(rngkey, log_w, psi, lost):
        if safe:
            # psi arrives in the 5-D carrier boundary shape (see below);
            # the per-particle helpers view it flat fusion-internally
            psi = psi.reshape(Bl, 2, -1)
        if pre_plan is not None:
            psi = _apply_items_batched(
                psi, jnp.zeros((max(pre_plan.num_params, 1),), psi.dtype),
                pre_plan, emesh.q_axis)
        if safe:
            p_all = jax.vmap(
                lambda s: _outcome_probs_local(
                    s, n_local, local_targets, emesh.q_axis,
                    shard_positions, k, q_sharded)[0])(psi)
        else:
            p_all, states = jax.vmap(
                lambda s: _outcome_split_local(s, n_local, local_targets,
                                               emesh.q_axis,
                                               shard_positions,
                                               k, q_sharded))(psi)
        lw_n = _global_normalize(log_w, emesh.p_axis)
        w = jnp.exp(lw_n)
        dist = jax.lax.psum(w @ p_all, emesh.p_axis)

        shard = jax.lax.axis_index(emesh.p_axis)
        gidx = shard * Bl + jnp.arange(Bl)
        keys = jax.vmap(lambda i: jax.random.fold_in(rngkey, i))(gidx)
        outcomes = jax.vmap(
            lambda kk, lp: jax.random.categorical(kk, lp)
        )(keys, jnp.log(jnp.clip(p_all, _MIN_P)))
        if safe:
            from qbot_tpu.inference.ensemble_exec import (
                _mask_factor_rows,
                _select_mask,
            )

            mrows = _mask_factor_rows(n_local, sorted(local_targets))
            F, S, L = _carrier(n_local)
            p_sel = jnp.take_along_axis(p_all, outcomes[:, None],
                                        axis=1)[:, 0]
            inv = 1.0 / jnp.sqrt(jnp.clip(p_sel, _MIN_P))
            if shard_positions:
                os = _shard_outcome_index(shard_positions, k,
                                          emesh.q_axis)
                match = (outcomes // K_l == os).astype(psi.dtype)
            else:
                match = jnp.ones_like(outcomes, psi.dtype)

            def collapse(s, o, iv, mt):
                m = _select_mask(mrows, n_local, o % K_l)
                return s.reshape(2, F, S, L) * (m * (iv * mt))

            new_psi = jax.vmap(collapse)(psi, outcomes, inv, match)
        else:
            new_psi = jnp.take_along_axis(
                states, outcomes[:, None, None, None], axis=1)[:, 0]

        # global ESS of the (unchanged) weights
        s1 = jax.lax.psum(jnp.sum(jnp.exp(lw_n)), emesh.p_axis)
        s2 = jax.lax.psum(jnp.sum(jnp.exp(2.0 * lw_n)), emesh.p_axis)
        ess_frac = (s1 * s1) / jnp.clip(s2, _MIN_P) / B_total
        rkey = jax.random.fold_in(rngkey, 2_000_000_000 + shard)
        new_lw, new_psi = _island_resample(rkey, log_w, new_psi, ess_frac,
                                           emesh.p_axis,
                                           threshold=ess_threshold)
        if post_plan is not None:
            flat = _apply_items_batched(
                new_psi.reshape(Bl, 2, -1),
                jnp.zeros((max(post_plan.num_params, 1),), new_psi.dtype),
                post_plan, emesh.q_axis)
            new_psi = flat.reshape(new_psi.shape)
        return new_lw, new_psi, lost, dist

    # 5-D carrier jit boundary in the safe regime: with the flat
    # (B, 2, 2^n) boundary shape, the Shardy partitioner's input-
    # marshalling copy of psi picks an (8,128)-tiled layout whose size-2
    # second-minor dim pads 8x — a measured 16 GB HLO temp for a 2 GB
    # ensemble at 24q (12.5% utilization), which capped the SMC particle
    # count.  The (B, 2, F, S, L) boundary has exact (8,128) trailing
    # dims, so no program layout can pad it.
    if safe:
        F, S, L = _carrier(n_local)
        Fg = (ens.psi.shape[-1] * (emesh.K if q_sharded else 1)) // (S * L)
        spec5 = (P(emesh.p_axis, None, emesh.q_axis, None, None)
                 if q_sharded else P(emesh.p_axis, None, None, None, None))
        in_psi = _boundary_reshape(ens.psi, (B_total, 2, Fg, S, L),
                                   donate)
        specs_in = (P(), spec_w, spec5, P())
        specs_out = (spec_w, spec5, P(), P())
    else:
        in_psi = ens.psi
        specs_in = (P(), spec_w, spec_psi, P())
        specs_out = (spec_w, spec_psi, P(), P())
    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=specs_in, out_specs=specs_out)
    ck = ("ms", n, tuple(sorted(local_targets)), tuple(shard_positions),
          q_sharded, B_total, float(ess_threshold), _mesh_key(emesh),
          ens.psi.dtype, donate, pre_d, post_d)
    log_w, psi, lost, dist = _cached_jit(
        ck, mapped, (2,) if donate or safe else ())(
        key, ens.log_w, in_psi, jnp.asarray(ens.lost_mass, jnp.float32))
    if safe:
        psi = _boundary_reshape(psi, (B_total, 2, Fg * S * L), True)
    return ShardedEnsemble(log_w, psi, lost), dist


def discard_sample_sharded(key, ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           emesh: EnsembleMesh,
                           ess_threshold: float = 0.5,
                           q_sharded: bool = True,
                           stats: Optional[dict] = None,
                           donate: bool = False,
                           pre_plan=None) -> ShardedEnsemble:
    """SMC-mode ``disc`` on the mesh: sample ONE traced-out basis state
    per particle; the register shrinks at constant particle count.
    ``pre_plan``: optional fused pre-collapse plan (see
    :func:`measure_sample_sharded`)."""
    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    _count(stats, (1 if q_sharded else 0) + 2 + 2)
    pre_d = _pre_digest(pre_plan)

    from qbot_tpu.inference.ensemble_exec import _safe_layouts

    t_l = len(sorted(local_targets))
    safe = _safe_layouts(n_local, t_l)

    def body(rngkey, log_w, psi, lost):
        if pre_plan is not None:
            psi = _apply_items_batched(
                psi, jnp.zeros((max(pre_plan.num_params, 1),), psi.dtype),
                pre_plan, emesh.q_axis)
        if safe:
            p_all = jax.vmap(
                lambda s: _outcome_probs_local(
                    s, n_local, local_targets, emesh.q_axis, (),
                    0, q_sharded)[0])(psi)
        else:
            p_all, states = jax.vmap(
                lambda s: _discard_split_local(s, n_local, local_targets,
                                               emesh.q_axis,
                                               q_sharded))(psi)
        shard = jax.lax.axis_index(emesh.p_axis)
        gidx = shard * Bl + jnp.arange(Bl)
        keys = jax.vmap(lambda i: jax.random.fold_in(rngkey, i))(gidx)
        outcomes = jax.vmap(
            lambda kk, lp: jax.random.categorical(kk, lp)
        )(keys, jnp.log(jnp.clip(p_all, _MIN_P)))
        if safe:
            from qbot_tpu.inference.ensemble_exec import (
                _carrier,
                _mask_factor_rows,
                _select_mask,
                _sum_over_targets,
            )

            srt = sorted(local_targets)
            mrows = _mask_factor_rows(n_local, srt)
            F, S, L = _carrier(n_local)
            p_sel = jnp.take_along_axis(p_all, outcomes[:, None],
                                        axis=1)[:, 0]
            inv = 1.0 / jnp.sqrt(jnp.clip(p_sel, _MIN_P))

            def extract(s, o, iv):
                m = _select_mask(mrows, n_local, o)
                masked = (s.reshape(2, F, S, L) * (m * iv)).reshape(2, -1)
                return _sum_over_targets(masked, n_local, srt)

            new_psi = jax.vmap(extract)(psi, outcomes, inv)
        else:
            new_psi = jnp.take_along_axis(
                states, outcomes[:, None, None, None], axis=1)[:, 0]
        lw_n = _global_normalize(log_w, emesh.p_axis)
        s1 = jax.lax.psum(jnp.sum(jnp.exp(lw_n)), emesh.p_axis)
        s2 = jax.lax.psum(jnp.sum(jnp.exp(2.0 * lw_n)), emesh.p_axis)
        ess_frac = (s1 * s1) / jnp.clip(s2, _MIN_P) / B_total
        rkey = jax.random.fold_in(rngkey, 2_000_000_000 + shard)
        # tiling-safe 5-D carrier view through the resample cond (see
        # measure_sample_sharded: the flat (Bl, 2, 2^m) temp pads 8x)
        cshape = new_psi.shape
        m_out = n_local - t_l
        if safe and m_out >= 14:
            from qbot_tpu.inference.ensemble_exec import (
                _carrier as _car,
            )

            F2, S2, L2 = _car(m_out)
            new_psi = new_psi.reshape(Bl, 2, F2, S2, L2)
        new_lw, new_psi = _island_resample(rkey, log_w, new_psi, ess_frac,
                                           emesh.p_axis,
                                           threshold=ess_threshold)
        return new_lw, new_psi.reshape(cshape), lost

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(P(), spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    ck = ("ds", n, tuple(sorted(local_targets)), q_sharded, B_total,
          float(ess_threshold), _mesh_key(emesh), ens.psi.dtype, donate,
          pre_d)
    log_w, psi, lost = _cached_jit(ck, mapped,
                                   (2,) if donate else ())(
        key, ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def replace_sample_sharded(key, ens: ShardedEnsemble, n: int,
                           local_targets: Sequence[int],
                           new_states,
                           emesh: EnsembleMesh,
                           q_sharded: bool = True,
                           stats: Optional[dict] = None,
                           pre_plan=None) -> ShardedEnsemble:
    """SMC-mode targeted ``qset`` on the mesh (VERDICT r4 #5): constant
    particle count.  Per particle: ONE traced-out basis state of the
    (localized) target subsystem is sampled from its qubit-psummed Born
    distribution and ONE eigen-branch of the new state from its static
    weights, then the branch ket is tensored back in shard-locally.
    Both draws are exact samples, so weights are untouched; PRNG keys
    fold the GLOBAL particle index so every qubit shard of a particle
    draws the same outcome/branch.
    """
    from qbot_tpu.inference.ensemble_exec import (
        _carrier,
        _insert_block,
        _mask_factor_rows,
        _safe_layouts,
        _select_mask,
        _sum_over_targets,
    )

    spec_w, spec_psi = emesh.specs(q_sharded)
    k = emesh.k if q_sharded else 0
    n_local = n - k
    srt = sorted(local_targets)
    t_l = len(srt)
    B_total = ens.num_particles
    Bl = B_total // emesh.P
    phis = [(float(w), np.asarray(phi, np.float32))
            for w, phi in new_states]
    logits = np.log(np.asarray([w for w, _ in phis], np.float32))
    phi_arr = np.stack([p for _, p in phis])
    safe = _safe_layouts(n_local, t_l)
    _count(stats, (1 if q_sharded else 0))
    pre_d = _pre_digest(pre_plan)

    def body(rngkey, log_w, psi, lost):
        if pre_plan is not None:
            psi = _apply_items_batched(
                psi, jnp.zeros((max(pre_plan.num_params, 1),), psi.dtype),
                pre_plan, emesh.q_axis)
        shard = jax.lax.axis_index(emesh.p_axis)
        gidx = shard * Bl + jnp.arange(Bl)
        keys = jax.vmap(lambda i: jax.random.fold_in(rngkey, i))(gidx)
        if safe:
            p_all = jax.vmap(
                lambda s: _outcome_probs_local(
                    s, n_local, srt, emesh.q_axis, (), 0,
                    q_sharded)[0])(psi)
            outcomes = jax.vmap(
                lambda kk, lp: jax.random.categorical(kk, lp)
            )(keys, jnp.log(jnp.clip(p_all, _MIN_P)))
            p_sel = jnp.take_along_axis(p_all, outcomes[:, None],
                                        axis=1)[:, 0]
            inv = 1.0 / jnp.sqrt(jnp.clip(p_sel, _MIN_P))
            mrows = _mask_factor_rows(n_local, srt)
            F, S, L = _carrier(n_local)

            def extract(s, o, iv):
                m = _select_mask(mrows, n_local, o)
                masked = (s.reshape(2, F, S, L) * (m * iv)).reshape(2, -1)
                return _sum_over_targets(masked, n_local, srt)

            rests = jax.vmap(extract)(psi, outcomes, inv)
        else:
            p_all, states = jax.vmap(
                lambda s: _discard_split_local(s, n_local, srt,
                                               emesh.q_axis,
                                               q_sharded))(psi)
            outcomes = jax.vmap(
                lambda kk, lp: jax.random.categorical(kk, lp)
            )(keys, jnp.log(jnp.clip(p_all, _MIN_P)))
            rests = jnp.take_along_axis(
                states, outcomes[:, None, None, None], axis=1)[:, 0]
        bkeys = jax.vmap(
            lambda i: jax.random.fold_in(rngkey, 1_000_000_000 + i))(gidx)
        draws = jax.vmap(
            lambda kk: jax.random.categorical(kk, jnp.asarray(logits))
        )(bkeys)
        phi_b = jnp.asarray(phi_arr, psi.dtype)[draws]
        new_psi = jax.vmap(
            lambda ph, r: _insert_block(ph, r, n_local, list(local_targets))
        )(phi_b, rests)
        return log_w, new_psi, lost

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(P(), spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    ck = ("rss", n, tuple(local_targets), q_sharded, B_total,
          _mesh_key(emesh), ens.psi.dtype, pre_d,
          tuple((w, p.tobytes()) for w, p in phis))
    log_w, psi, lost = _cached_jit(ck, mapped)(
        key, ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def resample_down_sharded(key, ens: ShardedEnsemble, B_target: int,
                          emesh: EnsembleMesh,
                          q_sharded: bool = True,
                          stats: Optional[dict] = None) -> ShardedEnsemble:
    """Shard-local systematic resample from the current batch down to
    ``B_target`` particles (island scheme: each particle shard resamples
    within itself and keeps its island's total weight, redistributed
    uniformly).  The SMC-mode replacement for the exact path's top-k
    prune after a branch concat — resampling is unbiased where top-k is
    not.  Weights must not be island-degenerate at the call site; the
    caller's :func:`maybe_exchange_islands` cadence handles that.
    """
    spec_w, spec_psi = emesh.specs(q_sharded)
    B_in = ens.num_particles
    Bl_in = B_in // emesh.P
    Bl_out = max(1, B_target // emesh.P)
    _count(stats, 0)

    def body(rngkey, log_w, psi, lost):
        shard = jax.lax.axis_index(emesh.p_axis)
        rkey = jax.random.fold_in(rngkey, shard)
        m = jnp.max(log_w)
        safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
        w = jnp.exp(log_w - safe_m)
        z = jnp.sum(w)
        wn = w / jnp.clip(z, _MIN_P)
        u = (jax.random.uniform(rkey, ()) + jnp.arange(Bl_out)) / Bl_out
        idx = jnp.clip(jnp.searchsorted(jnp.cumsum(wn), u), 0, Bl_in - 1)
        island_log = safe_m + jnp.log(jnp.clip(z, _MIN_P))
        new_lw = jnp.full((Bl_out,), island_log - np.log(Bl_out),
                          log_w.dtype)
        return new_lw, psi[idx], lost

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(P(), spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    ck = ("rd", B_in, Bl_out, q_sharded, _mesh_key(emesh),
          ens.psi.dtype, ens.psi.shape)
    log_w, psi, lost = _cached_jit(ck, mapped)(
        key, ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def island_log_weights(ens: ShardedEnsemble, emesh: EnsembleMesh):
    """(P,) log total weight per island (particle shard)."""
    Bl = ens.num_particles // emesh.P
    lw = ens.log_w.reshape(emesh.P, Bl)
    m = jnp.max(lw, axis=1)
    safe = jnp.where(jnp.isfinite(m), m, 0.0)
    return safe + jnp.log(jnp.clip(
        jnp.sum(jnp.exp(lw - safe[:, None]), axis=1), _MIN_P))


def maybe_exchange_islands(key, ens: ShardedEnsemble, emesh: EnsembleMesh,
                           threshold: float = 0.5,
                           q_sharded: bool = True,
                           stats: Optional[dict] = None
                           ) -> tuple[ShardedEnsemble, bool]:
    """Global island-level resampling, triggered on effective island count.

    Island resampling (:func:`_island_resample`) never moves particles
    between shards, so over deep measurement sequences the ISLAND weights
    themselves degenerate — a few shards end up carrying all the mass
    while the rest compute dead branches (VERDICT r3 weak #5).  This is
    the standard fix: when the effective island count
    ``1 / Σ wn_i²`` drops below ``threshold · P``, systematically
    resample whole islands from the island-weight distribution — each
    island replaces its particle block with a copy of a drawn source
    island's block (an XLA cross-shard gather on the particle axis) and
    the total weight splits uniformly across islands.  Whole-island
    systematic resampling is unbiased for every mixture expectation, and
    within-island relative weights are preserved.

    Runs as a plain jitted global computation (not shard_map): the
    trigger statistic needs only the (P,) island weights, and the
    conditional block-gather is left to XLA's partitioner.  Returns
    (ensemble, exchanged?) — the flag feeds exact collective accounting.
    """
    P_sh = emesh.P
    if P_sh == 1:
        return ens, False
    Bl = ens.num_particles // P_sh
    L_isl = island_log_weights(ens, emesh)
    m = jnp.max(L_isl)
    wn = jnp.exp(L_isl - m)
    wn = wn / jnp.clip(jnp.sum(wn), _MIN_P)
    n_eff = 1.0 / jnp.clip(jnp.sum(wn * wn), _MIN_P)
    do = bool(np.asarray(n_eff) < threshold * P_sh)
    if stats is not None:
        # the (P,)-sized island-weight reduction is one particle-axis
        # collective however the decision lands
        _count(stats, 1)
    if not do:
        return ens, False

    u = (jax.random.uniform(key, ()) + jnp.arange(P_sh)) / P_sh
    src = jnp.clip(jnp.searchsorted(jnp.cumsum(wn), u), 0, P_sh - 1)
    total = m + jnp.log(jnp.clip(jnp.sum(jnp.exp(L_isl - m)), _MIN_P))
    spec_w, spec_psi = emesh.specs(q_sharded)

    @jax.jit
    def do_exchange(log_w, psi, L_isl, src):
        lw2 = log_w.reshape(P_sh, Bl)
        new_lw = (lw2[src] - L_isl[src][:, None]
                  + (total - np.log(P_sh))).reshape(-1)
        new_psi = psi.reshape((P_sh, Bl) + psi.shape[1:])[src]
        new_psi = new_psi.reshape(psi.shape)
        new_lw = jax.lax.with_sharding_constraint(
            new_lw, NamedSharding(emesh.mesh, spec_w))
        new_psi = jax.lax.with_sharding_constraint(
            new_psi, NamedSharding(emesh.mesh, spec_psi))
        return new_lw, new_psi

    new_lw, new_psi = do_exchange(ens.log_w, ens.psi, L_isl, src)
    if stats is not None:
        # the island-block gather moves particle state across shards
        _count(stats, 1)
        stats["island_exchanges"] = stats.get("island_exchanges", 0) + 1
    return ShardedEnsemble(new_lw, new_psi, ens.lost_mass), True


def prune_sharded(ens: ShardedEnsemble, max_particles: int,
                  emesh: EnsembleMesh,
                  q_sharded: bool = True,
                  stats: Optional[dict] = None) -> ShardedEnsemble:
    """Standalone quota prune + global renormalise (see module docstring)."""
    B = ens.num_particles
    if B <= max_particles:
        return ens
    spec_w, spec_psi = emesh.specs(q_sharded)
    quota = max(1, max_particles // emesh.P)
    _count(stats, (2 if quota < B // emesh.P else 0) + 2)

    def body(log_w, psi, lost):
        return _prune_local(log_w, psi, quota, lost, emesh.p_axis)

    mapped = _shard_map(body, mesh=emesh.mesh,
                        in_specs=(spec_w, spec_psi, P()),
                        out_specs=(spec_w, spec_psi, P()))
    ck = ("pr", quota, B, q_sharded, _mesh_key(emesh), ens.psi.dtype,
          ens.psi.shape)
    log_w, psi, lost = _cached_jit(ck, mapped)(
        ens.log_w, ens.psi, jnp.asarray(ens.lost_mass, jnp.float32))
    return ShardedEnsemble(log_w, psi, lost)


def concat_sharded(weighted, emesh: EnsembleMesh,
                   q_sharded: bool = True) -> ShardedEnsemble:
    """Weight-concatenate [(p, ShardedEnsemble)] along the particle axis.

    All operands must share the SAME qubit layout (the sharded engine
    keeps a canonical identity perm for exactly this reason).  lost_mass
    combines as the p-weighted mixture bound.
    """
    spec_w, spec_psi = emesh.specs(q_sharded)
    log_w = jnp.concatenate(
        [q.log_w + float(np.log(p)) for p, q in weighted])
    psi = jnp.concatenate([q.psi for _, q in weighted])
    total = sum(p for p, _ in weighted)
    lost = sum(p * jnp.asarray(q.lost_mass, jnp.float32)
               for p, q in weighted) / total
    return ShardedEnsemble(
        jax.device_put(log_w, NamedSharding(emesh.mesh, spec_w)),
        jax.device_put(psi, NamedSharding(emesh.mesh, spec_psi)),
        lost)


# ---------------------------------------------------------------------------
# host-side readout (conformance / small-n)
# ---------------------------------------------------------------------------

def gather_ensemble(ens: ShardedEnsemble, perm=None):
    """(weights, complex kets) on the host, dead particles dropped and
    each state unpermuted to logical qubit order."""
    from qbot_tpu.tpu.sharded import unpermute_planar

    log_w = np.asarray(ens.log_w)
    psi = np.asarray(ens.psi)
    live = log_w > _NEG / 2
    log_w, psi = log_w[live], psi[live]
    w = np.exp(log_w - log_w.max())
    w = w / w.sum()
    if perm is not None and list(perm) != list(range(len(perm))):
        psi = np.stack([np.asarray(unpermute_planar(jnp.asarray(p), perm))
                        for p in psi])
    return w, psi[:, 0] + 1j * psi[:, 1]


def sharded_ensemble_mixture(ens: ShardedEnsemble, perm=None) -> np.ndarray:
    """Σ w |ψ⟩⟨ψ| as a dense complex density matrix (host; small n)."""
    w, kets = gather_ensemble(ens, perm)
    return np.einsum("b,bi,bj->ij", w, kets, np.conj(kets))
