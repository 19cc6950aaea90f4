"""Axis-scheduled XLA dot executor for planar statevectors.

Measured motivation (axon TPU v5e, 26 qubits, benchmarks/diag_pairperf.py
+ diag_xladot*.py): the Pallas DMA pipeline tops out near ~210 GB/s for
window-shaped tiles no matter the tile geometry, while a single XLA
``dot_general`` moves ~316 GB/s when its output is left in dot-native
order — and the *whole* planar complex window product fits in ONE dot via
realified algebra:

    out[x, i, rest] = sum_{c, j} M[x, i, c, j] * psi[c, ..., j, ...]

with ``M = [[Wr, -Wi], [Wi, Wr]]`` laid out as (2, D, 2, D).  One dot =
one read + one write of the state (the 4-matmul planar form reads each
component twice and writes intermediates).

Two hazards shape the design:

* **Output order.** The dot's native output puts the contracted window
  first — ``(x, i, a, b)`` — and forcing canonical order back costs a
  fused output transpose (~+45%/pass, measured).  So the executor tracks
  the axis permutation across steps instead; only the last window of a
  plan body pays a restore (fused into its einsum), so ``lax.scan`` can
  carry a fixed layout.
* **Minor-dim padding.** TPU tiles the last two dims as (8, 128); an
  intermediate whose minor dim is small is padded up to 64× — a 26-qubit
  view ending in a width-2 axis literally OOMs HBM (measured: a
  (1, 2^25, 2) temp padded 256 MB → 16 GB).  So the LANE BLOCK — the
  last ⌈min(n,7)⌉ qubits — is PINNED at the trailing axis positions for
  the whole plan: every non-lane window then contracts with the lane
  block behind it (minor dim ≥ 128), and the lane window itself
  contracts in trailing position with its output transposed back in the
  same einsum (``->xai``), never moving.  Fused phases use in-register
  iota masks over a (2, front, lane) view rather than fine-grained
  reshapes, for the same reason.

Windows are qubit-contiguous blocks and blocks move as units, so every
window's axes stay contiguous and in-order under the evolving
permutation (removing a contiguous block from an ordered list keeps the
rest ordered).

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

# block labels for restore specs; x/i/c/j are reserved for the planar
# axis and the window contraction
_LETTERS = "".join(ch for ch in
                   string.ascii_lowercase + string.ascii_uppercase
                   if ch not in "xicj")

_LANE_LOG2 = 7                # minor-dim block kept pinned at the tail


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
    view: tuple[int, ...]             # rhs reshape dims
    spec: str                         # einsum spec
    flips: tuple[int, ...]            # permuted flat indices, applied pre
    phases: tuple                     # (positions, z) bit specs, applied pre


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
    """(view, spec, perm_moves) for contracting the run [p, p+w).

    Lane windows (p + w == n) contract in trailing position with the
    output transposed back inside the dot (``->xai``) so the layout's
    minor dim stays the lane block — the permutation does NOT change.
    Other windows move to the front (dot-native order, no transpose).
    """
    A = 2 ** p
    D = 2 ** w
    B = 2 ** (n - p - w)
    if B == 1:                        # lane (or whole-register) window
        if A == 1:
            return (2, D), "xicj,cj->xi", False
        return (2, A, D), "xicj,caj->xai", False
    if A == 1:
        return (2, D, B), "xicj,cjb->xib", True
    return (2, A, D, B), "xicj,cajb->xiab", True


def _restore_spec(n: int, p: int, w: int, perm_before, restore_to):
    """Einsum contracting [p, p+w) whose output lands in ``restore_to``.

    The non-window axes are split into maximal runs consecutive in
    ``restore_to`` (never straddling the window position) and the output
    spec emits them reordered — the transpose rides the dot's output
    write.  Returns (view, spec) or None when the restore is not a block
    permutation (caller falls back to the planar executor).
    """
    w_qubits = list(perm_before[p:p + w])
    rest = list(perm_before[:p]) + list(perm_before[p + w:])
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
    if tuple(flat) != tuple(restore_to):
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
    spec = ("xicj,c" + "".join(rhs_letters) + "->x" + "".join(out_letters))
    return tuple(view), spec


def _permuted_phase(phase, perm, n):
    """Phase factor as ((bit_pos, want) ...) in PERMUTED bit positions."""
    qubits, z = phase[0], phase[1]
    pattern = phase[2] if len(phase) > 2 else -1
    k = len(qubits)
    bits = []
    for idx, q in enumerate(qubits):
        want = 1 if pattern < 0 else (pattern >> (k - 1 - idx)) & 1
        bits.append((perm.index(q), want))
    return (tuple(bits), complex(z))


def _grouped_view_ok(view, n: int) -> bool:
    """Reject views whose last two dims would pad badly on TPU tiles."""
    if n <= 13:                       # small states: padding is noise
        return True
    return view[-1] >= 128 and (len(view) < 3 or view[-2] >= 8)


def lower_dot_plan(plan: Plan, cycle: bool = True) -> Optional[DotPlan]:
    """Lower a window plan to dot-engine steps, or None if a step cannot
    run under the pinned-lane axis permutation (caller falls back to the
    planar executor).

    ``cycle=True`` makes the final permutation equal the entry
    permutation (identity), so ``lax.scan`` can iterate the plan body.
    """
    n = plan.n
    if n < 2:
        return None
    lane_start = n - min(n, _LANE_LOG2)
    strict = n > 13
    perm = list(range(n))
    lowered: list = []
    flat = [s for s in expand_pairs(plan.steps)]
    win_idx = [i for i, s in enumerate(flat) if isinstance(s, WindowStep)]
    if not win_idx:
        return None
    last_win = win_idx[-1]
    for idx, s in enumerate(flat):
        if isinstance(s, WindowStep):
            is_lane = s.start >= lane_start
            if not is_lane and s.start + s.width > lane_start:
                return None           # window straddles the lane block
            if strict and not is_lane and s.width < 3:
                return None           # width-1/2 minor axes pad 4x+
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
            if cycle and idx == last_win:
                target = list(range(n))
                sv = _restore_spec(n, p0, s.width, perm, target)
                if sv is None:
                    return None
                view, spec = sv
                perm = target
            else:
                view, spec, moves = _native_spec(n, p0, s.width)
                if moves:
                    perm = qs + [q for q in perm if q not in qs]
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
        return None                   # no trailing window to restore on
    return DotPlan(n=n, num_params=plan.num_params, steps=lowered,
                   entry_perm=tuple(range(n)), final_perm=tuple(perm))


def _realify(Wr, Wi):
    """(2, D, 2, D) realified matrix M[x,i,c,j] from planar (Wr, Wi)."""
    return jnp.stack([jnp.stack([Wr, -Wi], axis=1),
                      jnp.stack([Wi, Wr], axis=1)], axis=0)


def _apply_phases_masked(psi, n, phases):
    """Controlled-phase factors as in-register iota bit masks.

    The state views as (2, front, lane) — minor dim stays the lane block
    so no small-axis padding — and each factor's mask is a product of
    bit tests on two broadcasted iotas, fused by XLA into the
    neighbouring pass (same trick as the scanned-reflect runner's
    ``sign_pattern``; the barrier stops constant-folding into a
    state-sized literal).
    """
    lane = min(n, _LANE_LOG2)
    F = 2 ** (n - lane)
    L = 2 ** lane
    row = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    row, col = jax.lax.optimization_barrier((row, col))
    t = psi.reshape(2, F, L)
    pr, pi = t[0], t[1]
    for bits, z in phases:
        mask = None
        for pos, want in bits:
            if pos < n - lane:
                bit = (row >> (n - lane - 1 - pos)) & 1
            else:
                bit = (col >> (n - 1 - pos)) & 1
            m = bit if want else 1 - bit
            mask = m if mask is None else mask * m
        maskf = mask.astype(pr.dtype)
        fr = 1.0 + (np.float32(z.real) - 1.0) * maskf
        fi = np.float32(z.imag) * maskf
        pr, pi = pr * fr - pi * fi, pr * fi + pi * fr
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
