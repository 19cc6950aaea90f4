"""Axis-scheduled XLA dot executor for planar statevectors.

Measured motivation (axon TPU v5e, 26 qubits, benchmarks/diag_pairperf.py
+ diag_xladot.py): the Pallas DMA pipeline tops out near ~210 GB/s for
window-shaped tiles no matter the tile geometry, while a single XLA
``dot_general`` moves ~305 GB/s when its output is left in dot-native
order — and the *whole* planar complex window product fits in ONE dot via
realified algebra:

    out[x, i, rest] = sum_{c, j} M[x, i, c, j] * psi[c, ..., j, ...]

with ``M = [[Wr, -Wi], [Wi, Wr]]`` laid out as (2, D, 2, D).  One dot =
one read + one write of the state (the 4-matmul planar form reads each
component twice and writes intermediates).

The catch: the dot's native output order puts the contracted window's
axes FIRST — ``(x, i, a, b)`` — and forcing the canonical order back costs
a fused output transpose (~+45% per pass, measured).  So this executor
never forces it: it tracks the axis permutation across steps and
contracts each window from wherever its axes currently live.  Windows are
qubit-contiguous blocks, and blocks move as units, so every window's axes
stay contiguous and in-order under the evolving permutation (removing a
contiguous block from anywhere in an ordered list keeps the rest ordered).
Only the LAST step of a plan pays a restore (needed so ``lax.scan`` can
carry a fixed layout), folded into its einsum output spec.

Diagonals (fused pre-flips, controlled phases, DiagSteps) are elementwise
and permutation-aware: indices and target positions are remapped at lower
time; XLA fuses them into neighbouring passes.

No reference analogue (the reference is serial NumPy: qgates.py:278-279);
this is the TPU-native formulation of SURVEY.md §7 decision 1.
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
    PairStep,
    PhaseStep,
    Plan,
    ReflectStep,
    WindowStep,
    expand_pairs,
    phase_as_diag,
)

__all__ = ["lower_dot_plan", "apply_plan_dot", "DotPlan", "dot_precision",
           "make_scanned_dot_runner"]

_LETTERS = string.ascii_lowercase.replace("x", "") + \
    string.ascii_uppercase


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
    view: tuple[int, ...]             # rhs reshape dims (2, A?, D, B?)
    spec: str                         # einsum spec
    out_view: tuple[int, ...]         # reshape of the einsum output
    flips: tuple[int, ...]            # permuted flat indices, applied pre
    phases: tuple                     # (positions, z, pattern), applied pre


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


def _window_spec(n: int, p: int, w: int, perm_after, restore_to=None):
    """Einsum spec + views for contracting the run [p, p+w).

    ``restore_to``: if given, the output axes are emitted so the state
    lands in that permutation (the restore is fused into the dot's
    output write).  Returns (view, spec, out_view).
    """
    A = 2 ** p
    D = 2 ** w
    B = 2 ** (n - p - w)
    if restore_to is None:
        if A > 1 and B > 1:
            return ((2, A, D, B), "xicj,cajb->xiab", (2, D, A, B))
        if A > 1:
            return ((2, A, D), "xicj,caj->xia", (2, D, A))
        if B > 1:
            return ((2, D, B), "xicj,cjb->xib", (2, D, B))
        return ((2, D), "xicj,cj->xi", (2, D))
    # Restore: split the non-window axes into maximal runs that are
    # consecutive in restore_to, emit the output spec in restored order
    # (the transpose rides the dot's output write).  perm_after = window
    # qubits + rest; restore_to is a permutation of the same qubits.
    w_qubits = perm_after[:w]
    rest = perm_after[w:]
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

    # blocks must not straddle the window's pre-contraction position p:
    # rest[:p] sat before the window in memory, rest[p:] after
    blocks = runs(rest[:p]) + runs(rest[p:])
    items = [("win", tuple(w_qubits))] + [("blk", b) for b in blocks]
    items.sort(key=lambda kb: pos_in_restore[kb[1][0]])
    flat = [q for _, b in items for q in b]
    if tuple(flat) != tuple(restore_to):
        return None                   # not a block permutation
    rest_letters = {b: _LETTERS[bi] for bi, b in enumerate(blocks)}
    out_letters = ["i" if kind == "win" else rest_letters[b]
                   for kind, b in items]
    # rhs axes in pre-contraction order: rest[:p] blocks, window, rest[p:]
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
    spec = ("xicj,c" + "".join(rhs_letters) + "->x" + "".join(out_letters))
    out_view = (2,) + tuple(2 ** len(b) for _, b in items)
    return tuple(view), spec, out_view


def _permuted_phase(phase, perm):
    qubits, z = phase[0], phase[1]
    pattern = phase[2] if len(phase) > 2 else -1
    positions = tuple(perm.index(q) for q in qubits)
    return (positions, complex(z), pattern)


def lower_dot_plan(plan: Plan, cycle: bool = True) -> Optional[DotPlan]:
    """Lower a window plan to dot-engine steps, or None if a step cannot
    run under axis permutation (caller falls back to the planar executor).

    ``cycle=True`` makes the final permutation equal the entry
    permutation (identity), so ``lax.scan`` can iterate the plan body.
    """
    n = plan.n
    perm = list(range(n))
    lowered: list = []
    flat = [s for s in expand_pairs(plan.steps)]
    # find the last window step (it absorbs the restore)
    last_win = max((i for i, s in enumerate(flat)
                    if isinstance(s, WindowStep)), default=None)
    if last_win is None or n < 2:
        return None
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
            phases = tuple(_permuted_phase(ph, perm)
                           for ph in s.pre_phases)
            new_perm = qs + [q for q in perm if q not in qs]
            if cycle and idx == last_win:
                target = list(range(n))
                sv = _window_spec(n, p0, s.width, new_perm,
                                  restore_to=target)
                if sv is None:
                    return None
                view, spec, out_view = sv
                perm = target
            else:
                view, spec, out_view = _window_spec(n, p0, s.width,
                                                    new_perm)
                perm = new_perm
            lowered.append(_Win(s, view, spec, out_view, flips, phases))
        elif isinstance(s, FlipStep):
            lowered.append(_Flip(_flat_index_permuted(s.index, n, perm)))
        elif isinstance(s, PhaseStep):
            d = phase_as_diag(s)
            positions = tuple(perm.index(q) for q in d.targets)
            from qbot_tpu.tpu.planar import _diag_grouped_views
            view, dr, di = _diag_grouped_views(n, positions, d.diag)
            lowered.append(_Diag(view, dr, di))
        elif isinstance(s, DiagStep):
            positions = tuple(perm.index(q) for q in s.targets)
            from qbot_tpu.tpu.planar import _diag_grouped_views
            view, dr, di = _diag_grouped_views(n, positions, s.diag)
            lowered.append(_Diag(view, dr, di))
        elif isinstance(s, ReflectStep):
            # factor blocks tile [0, n) in canonical order; they survive
            # permutation only if each block is a contiguous in-order run
            sizes = [int(f.shape[0]).bit_length() - 1 for f in s.factors]
            starts = np.cumsum([0] + sizes[:-1])
            fperm = []
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
        return None                   # no trailing window to restore on
    return DotPlan(n=n, num_params=plan.num_params, steps=lowered,
                   entry_perm=tuple(range(n)), final_perm=tuple(perm))


def _realify(Wr, Wi):
    """(2, D, 2, D) realified matrix M[x,i,c,j] from planar (Wr, Wi)."""
    return jnp.stack([jnp.stack([Wr, -Wi], axis=1),
                      jnp.stack([Wi, Wr], axis=1)], axis=0)


def _apply_phases_elementwise(psi, n, phases):
    """Controlled-phase factors as broadcast masked complex multiplies.

    Positions are already permuted.  Mask products stay in-register: XLA
    fuses the whole chain into the neighbouring pass's loop.
    """
    from qbot_tpu.tpu.planar import _diag_grouped_views

    for positions, z, pattern in phases:
        k = len(positions)
        diag = np.ones(2 ** k, dtype=np.complex128)
        if pattern < 0:
            diag[-1] = z
        else:
            diag[pattern] = z
        view, dr, di = _diag_grouped_views(n, positions, diag)
        t = psi.reshape(view)
        pr, pi = t[0], t[1]
        out_r = dr * pr - di * pi
        out_i = dr * pi + di * pr
        psi = jnp.stack([out_r, out_i]).reshape(psi.shape)
    return psi


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
                psi = _apply_phases_elementwise(psi, n, s.phases)
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
    runner).  The body's restore is fused into its last dot, so the scan
    carry keeps the canonical layout.
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
