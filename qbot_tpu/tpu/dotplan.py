"""Axis-scheduled XLA dot executor for planar statevectors.

Measured motivation (axon TPU v5e, 26 qubits, benchmarks/diag_*.py; all
numbers corrected for the ~21 ms per-call dispatch overhead — see
docs/perf.md): the Pallas DMA pipeline caps near ~315 GB/s for
window-shaped tiles, while a single XLA ``dot_general`` moves ~518 GB/s
when its output stays in dot-native order — and the whole planar complex
window product fits in ONE dot via realified algebra:

    out[x, i, rest] = sum_{c, j} M[x, i, c, j] * psi[c, ..., j, ...]

with ``M = [[Wr, -Wi], [Wi, Wr]]`` laid out as (2, D, 2, D).  One dot =
one read + one write of the state.

Three hazards shape the design:

* **Output order.** Forcing the dot's output back to canonical axis
  order costs a fused transpose (~+45%/pass).  The executor instead
  tracks the axis permutation across steps; only the last front window
  of a plan body pays a restore (fused into its einsum), so ``lax.scan``
  can carry a fixed layout.
* **Minor-dim padding.** TPU tiles the last two dims (8, 128); a view
  ending in a small axis pads up to 64× (a 26q (…,2)-minor temp OOMs
  HBM — measured).
* **Inter-pass relayouts.** XLA re-tiles whenever consecutive views
  change the last-two dims — this cost the first dot-engine cut
  ~3.5 ms/pass.  Fix (measured 1.8×, diag_pintail.py): the last two
  axis blocks — the LANE block (last min(n,7) qubits) and the SUBLANE
  block (the min(3, n-lane) before it) — are PINNED in place for the
  whole plan, so every view ends with the same (S, L) = (8, 128) dims
  and leading-dim re-splits are bitcasts.  Front windows contract with
  the tail behind them (dot-native output, window moves to front);
  tail windows contract in place with the output transposed inside the
  einsum (``->xfil`` / ``->xfsi``), never moving.

Windows are qubit-contiguous blocks and front blocks move as units, so
every window's axes stay contiguous and in-order under the evolving
permutation.  ``compile_circuit(partition="dot")`` aligns the window
partition to the tail blocks at n >= 14.

No reference analogue (the reference is serial NumPy: qgates.py:278-279);
this is a TPU-native alternative engine for SURVEY.md §7 decision 1.
"""
from __future__ import annotations

import string
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.tpu.compiler import (
    ContractStep,
    DiagStep,
    FlipStep,
    PhaseStep,
    Plan,
    ReflectStep,
    WindowStep,
    expand_pairs,
    phase_as_diag,
)

__all__ = ["lower_dot_plan", "apply_plan_dot", "DotPlan", "dot_precision",
           "make_scanned_dot_runner"]

# block labels for specs; x/i/c/j reserved (planar axis + contraction),
# s/l reserved (pinned sublane/lane tail axes)
_LETTERS = "".join(ch for ch in
                   string.ascii_lowercase + string.ascii_uppercase
                   if ch not in "xicjsl")

_LANE_LOG2 = 7                # pinned minor axis (lanes)
_SUB_LOG2 = 3                 # pinned second-minor axis (sublanes)


def dot_precision():
    """Map the kernel dot mode to an XLA dot precision.

    f32 -> HIGHEST (6-pass bf16 = full f32), bf16_3x -> HIGH (3-pass
    bf16, the hardware's native version of the manual Dekker split in
    kernels._dot), bf16 -> DEFAULT (single pass).
    """
    from qbot_tpu.tpu.kernels import dot_mode

    return {"f32": jax.lax.Precision.HIGHEST,
            "bf16_3x": jax.lax.Precision.HIGH,
            "bf16": jax.lax.Precision.DEFAULT}[dot_mode()]


def _tail_split(n: int) -> tuple[int, int, int]:
    """(front_qubits, sublane_qubits, lane_qubits) for the pinned tail."""
    lane = min(n, _LANE_LOG2)
    sub = min(_SUB_LOG2, n - lane)
    return n - sub - lane, sub, lane


def _flat_index_permuted(m: int, n: int, perm) -> int:
    """Map a canonical basis index to the permuted layout's flat index.

    Bit for qubit q sits at position ``perm.index(q)``; qubit 0 is the
    most-significant bit (axis 0), matching the executors' reshape
    convention.
    """
    out = 0
    for pos, q in enumerate(perm):
        bit = (m >> (n - 1 - q)) & 1
        out |= bit << (n - 1 - pos)
    return out


@dataclass(frozen=True)
class _Win:
    """One window contraction pass."""
    step: WindowStep                  # terms to fold (matrices/params)
    view: tuple[int, ...]             # rhs reshape dims
    spec: str                         # einsum spec
    flips: tuple[int, ...]            # permuted flat indices, applied pre
    phases: tuple                     # ((bit_pos, want)..., z), applied pre


@dataclass(frozen=True)
class _Diag:
    view: tuple[int, ...]
    dr: np.ndarray
    di: np.ndarray


@dataclass(frozen=True)
class _Flip:
    index: int                        # permuted flat index


@dataclass(frozen=True)
class _Contract:
    step: ContractStep
    positions: tuple[int, ...]


@dataclass(frozen=True)
class _Reflect:
    step: ReflectStep                 # factors already in permuted order
    flips: tuple[int, ...]


@dataclass
class DotPlan:
    n: int
    num_params: int
    steps: list
    entry_perm: tuple[int, ...]
    final_perm: tuple[int, ...]       # == entry_perm when cycle=True


def _native_spec(n: int, p: int, w: int):
    """(view, spec, moves_to_front) contracting the run [p, p+w).

    Front windows carry the pinned (S, L) tail as passthrough axes and
    move to the front of the front region; tail windows contract in
    place with the output transposed inside the dot so the (S, L) axes
    stay last.
    """
    front, sub, lane = _tail_split(n)
    S, L = 2 ** sub, 2 ** lane
    if p + w <= front:                # front window
        A = 2 ** p
        D = 2 ** w
        B = 2 ** (front - p - w)
        return ((2, A, D, B, S, L), "xicj,cajbsl->xiabsl", True)
    if p == front and w == sub:       # sublane window
        return ((2, 2 ** front, S, L), "xicj,cfjl->xfil", False)
    if p == front + sub and w == lane:  # lane window
        return ((2, 2 ** front, S, L), "xicj,cfsj->xfsi", False)
    return None                       # straddles the pinned tail


def _restore_spec(n: int, p: int, w: int, perm_before, restore_to):
    """Front-window einsum whose output lands in ``restore_to``.

    Only the front region permutes (tail windows contract in place), so
    the restore reorders front blocks; the pinned (s, l) axes ride
    through as trailing passthrough letters.  Returns (view, spec) or
    None when the restore is not a block permutation.
    """
    front, sub, lane = _tail_split(n)
    S, L = 2 ** sub, 2 ** lane
    fperm = list(perm_before[:front])
    w_qubits = fperm[p:p + w]
    rest = fperm[:p] + fperm[p + w:]
    pos_in_restore = {q: k for k, q in enumerate(restore_to)}

    def runs(seg):
        out = []
        i = 0
        while i < len(seg):
            j = i + 1
            while (j < len(seg) and pos_in_restore[seg[j]]
                   == pos_in_restore[seg[j - 1]] + 1):
                j += 1
            out.append(tuple(seg[i:j]))
            i = j
        return out

    blocks = runs(rest[:p]) + runs(rest[p:])
    items = [("win", tuple(w_qubits))] + [("blk", b) for b in blocks]
    items.sort(key=lambda kb: pos_in_restore[kb[1][0]])
    flat = [q for _, b in items for q in b]
    if tuple(flat) != tuple(restore_to[:front]):
        return None                   # not a block permutation
    rest_letters = {b: _LETTERS[bi] for bi, b in enumerate(blocks)}
    out_letters = ["i" if kind == "win" else rest_letters[b]
                   for kind, b in items]
    rhs_letters = []
    view = [2]
    qcount = 0
    rhs_done = False
    for b in blocks:
        if qcount == p and not rhs_done:
            rhs_letters.append("j")
            view.append(2 ** len(w_qubits))
            rhs_done = True
        rhs_letters.append(rest_letters[b])
        view.append(2 ** len(b))
        qcount += len(b)
    if not rhs_done:
        rhs_letters.append("j")
        view.append(2 ** len(w_qubits))
    view += [S, L]
    spec = ("xicj,c" + "".join(rhs_letters) + "sl->x"
            + "".join(out_letters) + "sl")
    return tuple(view), spec


def _permuted_phase(phase, perm, n):
    """Phase factor as host-precomputed per-axis mask vectors.

    The mask (1 where every listed bit matches) factorises per qubit, so
    it splits across the (front, sublane, lane) carrier axes as an outer
    product of three 0/1 CONSTANT vectors — no in-trace iotas, no
    optimization_barrier, nothing for XLA's fusion pass to trip on (the
    barriered-iota form measured as an unfused extra pass per phase
    group).  The largest vector is 2^front floats (256 KB at 26q).
    """
    qubits, z = phase[0], phase[1]
    pattern = phase[2] if len(phase) > 2 else -1
    k = len(qubits)
    front, sub, lane = _tail_split(n)
    sizes = (2 ** front, 2 ** sub, 2 ** lane)
    vecs = [np.ones(sz, dtype=np.float32) for sz in sizes]
    spans = ((0, front), (front, front + sub), (front + sub, n))
    for idx, q in enumerate(qubits):
        want = 1 if pattern < 0 else (pattern >> (k - 1 - idx)) & 1
        pos = perm.index(q)
        for ax, (lo, hi) in enumerate(spans):
            if lo <= pos < hi:
                ar = np.arange(sizes[ax])
                bit = (ar >> (hi - 1 - pos)) & 1
                vecs[ax] *= (bit == want).astype(np.float32)
                break
    return (vecs[0], vecs[1], vecs[2], complex(z))


def _grouped_view_ok(view, n: int) -> bool:
    """Reject views whose last two dims would pad badly on TPU tiles."""
    if n <= 13:                       # small states: padding is noise
        return True
    return view[-1] >= 128 and (len(view) < 3 or view[-2] >= 8)


def lower_dot_plan(plan: Plan, cycle: bool = True) -> Optional[DotPlan]:
    """Lower a window plan to dot-engine steps, or None if a step cannot
    run under the pinned-tail axis permutation (caller falls back to the
    planar executor).

    ``cycle=True`` makes the final permutation equal the entry
    permutation (identity), so ``lax.scan`` can iterate the plan body.
    """
    n = plan.n
    if n < 2:
        return None
    front, sub, lane = _tail_split(n)
    perm = list(range(n))
    lowered: list = []
    flat = [s for s in expand_pairs(plan.steps)]
    # the restore folds into the LAST front window (tail windows never
    # disturb the permutation)
    front_wins = [i for i, s in enumerate(flat)
                  if isinstance(s, WindowStep)
                  and s.start + s.width <= front]
    if not any(isinstance(s, WindowStep) for s in flat):
        return None
    last_front = front_wins[-1] if front_wins else None
    for idx, s in enumerate(flat):
        if isinstance(s, WindowStep):
            qs = list(range(s.start, s.start + s.width))
            positions = [perm.index(q) for q in qs]
            p0 = positions[0]
            if positions != list(range(p0, p0 + s.width)):
                return None           # block torn apart (cannot happen
                                      # for partition windows; bail safe)
            flips = tuple(_flat_index_permuted(m, n, perm)
                          for m in s.pre_flips)
            phases = tuple(_permuted_phase(ph, perm, n)
                           for ph in s.pre_phases)
            if cycle and idx == last_front:
                # always restore here: a native front contraction would
                # move this window to the front and break the cycle even
                # when the permutation is currently canonical
                sv = _restore_spec(n, p0, s.width, perm,
                                   list(range(n)))
                if sv is None:
                    return None
                view, spec = sv
                perm = list(range(n))
            else:
                sv = _native_spec(n, p0, s.width)
                if sv is None:
                    return None
                view, spec, moves = sv
                if moves:
                    perm = (qs + [q for q in perm[:front] if q not in qs]
                            + perm[front:])
            lowered.append(_Win(s, view, spec, flips, phases))
        elif isinstance(s, FlipStep):
            lowered.append(_Flip(_flat_index_permuted(s.index, n, perm)))
        elif isinstance(s, (PhaseStep, DiagStep)):
            d = phase_as_diag(s) if isinstance(s, PhaseStep) else s
            positions = tuple(perm.index(q) for q in d.targets)
            from qbot_tpu.tpu.planar import _diag_grouped_views
            view, dr, di = _diag_grouped_views(n, positions, d.diag)
            if not _grouped_view_ok(view, n):
                return None
            lowered.append(_Diag(view, dr, di))
        elif isinstance(s, ReflectStep):
            # factor blocks tile [0, n) in canonical order; they survive
            # permutation only if each block is a contiguous in-order run
            sizes = [int(f.shape[0]).bit_length() - 1 for f in s.factors]
            starts = np.cumsum([0] + sizes[:-1])
            ok = True
            order = []
            for f, st, sz in zip(s.factors, starts, sizes):
                pos = [perm.index(q) for q in range(st, st + sz)]
                if pos != list(range(pos[0], pos[0] + sz)):
                    ok = False
                    break
                order.append((pos[0], f))
            if not ok:
                return None
            order.sort(key=lambda t: t[0])
            fperm = tuple(f for _, f in order)
            flips = tuple(_flat_index_permuted(m, n, perm)
                          for m in s.pre_flips)
            lowered.append(_Reflect(
                ReflectStep(fperm, s.original, flips), flips))
        elif isinstance(s, ContractStep):
            positions = tuple(perm.index(q) for q in s.targets)
            lowered.append(_Contract(s, positions))
        else:
            return None
    if cycle and perm != list(range(n)):
        return None                   # no front window to restore on
    return DotPlan(n=n, num_params=plan.num_params, steps=lowered,
                   entry_perm=tuple(range(n)), final_perm=tuple(perm))


def _realify(Wr, Wi):
    """(2, D, 2, D) realified matrix M[x,i,c,j] from planar (Wr, Wi)."""
    return jnp.stack([jnp.stack([Wr, -Wi], axis=1),
                      jnp.stack([Wi, Wr], axis=1)], axis=0)


def _apply_phases_masked(psi, n, phases):
    """Controlled-phase factors as broadcast constant mask vectors.

    The state views as the pinned (2, F, S, L) carrier — the last two
    dims never change so no relayout — and each factor's mask is an
    outer product of three host-precomputed 0/1 vectors (one per carrier
    axis), kept in-register by XLA's elementwise fusion.
    """
    front, sub, lane = _tail_split(n)
    F, S, L = 2 ** front, 2 ** sub, 2 ** lane
    t = psi.reshape(2, F, S, L)
    pr, pi = t[0], t[1]
    for mf, ms, ml, z in phases:
        maskf = (jnp.asarray(mf).reshape(F, 1, 1)
                 * jnp.asarray(ms).reshape(1, S, 1)
                 * jnp.asarray(ml).reshape(1, 1, L)).astype(pr.dtype)
        fr = 1.0 + (np.float32(z.real) - 1.0) * maskf
        fim = np.float32(z.imag) * maskf
        pr, pi = pr * fr - pi * fim, pr * fim + pi * fr
    return jnp.stack([pr, pi]).reshape(2, -1)


def apply_plan_dot(psi: jnp.ndarray, lowered: DotPlan,
                   params=None) -> jnp.ndarray:
    """Run a lowered dot plan over a planar (2, 2^n) state (traceable)."""
    from qbot_tpu.tpu.planar import (
        _apply_contract_planar,
        _apply_reflect_planar,
        _fold_planar_pair,
    )

    n = lowered.n
    prec = dot_precision()
    for s in lowered.steps:
        if isinstance(s, _Win):
            for m in s.flips:
                psi = psi.at[:, m].multiply(-1)
            if s.phases:
                psi = _apply_phases_masked(psi, n, s.phases)
            Wr, Wi = _fold_planar_pair(s.step, params, psi.dtype)
            M = _realify(Wr, Wi)
            out = jnp.einsum(s.spec, M, psi.reshape(s.view),
                             precision=prec)
            psi = out.reshape(2, -1)
        elif isinstance(s, _Diag):
            t = psi.reshape(s.view)
            pr, pi = t[0], t[1]
            out_r = s.dr * pr - s.di * pi
            out_i = s.dr * pi + s.di * pr
            psi = jnp.stack([out_r, out_i]).reshape(2, -1)
        elif isinstance(s, _Flip):
            psi = psi.at[:, s.index].multiply(-1)
        elif isinstance(s, _Reflect):
            psi = _apply_reflect_planar(psi, n, s.step)
        else:                          # _Contract
            st = s.step
            mapped = ContractStep(targets=s.positions, matrix=st.matrix,
                                  param_idx=st.param_idx, maker=st.maker,
                                  num_controls=st.num_controls)
            psi = _apply_contract_planar(psi, n, mapped, params)
    return psi


def make_scanned_dot_runner(plan: Plan, repeats: int, init_plan=None):
    """jit(psi, params?) -> state after ``repeats`` plan bodies, dot engine.

    Returns None when the plan does not lower (caller uses the planar
    runner).  The body's restore is fused into its last front dot, so
    the scan carry keeps the canonical layout.
    """
    lowered = lower_dot_plan(plan, cycle=True)
    if lowered is None:
        return None
    init_lowered = None
    if init_plan is not None:
        init_lowered = lower_dot_plan(init_plan, cycle=True)

    @jax.jit
    def run(psi, params=None):
        if init_plan is not None:
            if init_lowered is not None:
                psi = apply_plan_dot(psi, init_lowered, params)
            else:
                from qbot_tpu.tpu.planar import apply_plan_planar
                psi = apply_plan_planar(psi, init_plan, params)

        def step(carry, _):
            return apply_plan_dot(carry, lowered, params), None

        psi, _ = jax.lax.scan(step, psi, None, length=repeats)
        return psi
    return run
