"""Planar-complex executors: the real-TPU compute path.

The TPU backend in this environment exposes no complex dtypes, so on-device
state is stored **planar**: a float32 array of shape ``(2, 2^n)`` holding
(real, imag) on the leading axis (density: ``(2, 2^n, 2^n)``).  Every
complex operation decomposes into real arithmetic:

* window matmul: (Wr + iWi)(xr + ixi) → 4 real batched matmuls on the MXU;
* diagonal step: planar elementwise multiply (one fused VPU pass);
* probabilities: xr² + xi².

Fully-static window steps are fused to a single complex matrix on the host
at compile time (no in-trace folding at all); parameterised terms fold
in-trace with planar products, so HMC gradients flow through float32 only.

Semantically identical to :mod:`qbot_tpu.tpu.simulator` (the complex
executor used on CPU for conformance); tests cross-check the two.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# XLA's default TPU matmul precision is bf16; the simulation paths need
# full f32 — request it explicitly on every contraction.
_PREC = jax.lax.Precision.HIGHEST

from qbot_tpu.ops.gates import controlled as controlled_np
from qbot_tpu.tpu.compiler import (
    ContractStep,
    DiagStep,
    FlipStep,
    PairStep,
    PhaseStep,
    Plan,
    ReflectStep,
    Term,
    WindowStep,
    phase_as_diag,
)

__all__ = ["zero_state_planar", "to_planar", "from_planar",
           "product_state_planar",
           "apply_plan_planar", "make_planar_runner",
           "make_scanned_planar_runner", "planar_probs", "planar_norm",
           "zero_density_planar", "apply_plan_density_planar",
           "make_planar_density_runner", "planar_density_probs"]

REAL_DTYPE = jnp.float32

# Below this flat dimension the host kron + one tiny transfer is cheaper
# than compiling a device build (and keeps small-n conformance tests on
# the exact complex128 host arithmetic).  Above it, host->device transfer
# dominates everything: the axon tunnel moves ~60 MB/s, so a 26-qubit
# planar state (512 MB) costs ~8 s to upload but ~50 ms to BUILD on the
# device (measured, benchmarks/diag_anchor_tx.py).
_DEVICE_BUILD_MIN_DIM = 2 ** 16
_PRODUCT_CACHE: dict = {}


def product_state_planar(kets, dtype=np.float32) -> jnp.ndarray:
    """Planar (2, 2^n) normalised product state ⊗kets, built ON DEVICE.

    The reference preps registers by host-side ``np.kron`` chains
    (/root/reference/qbot/density.py:7-23 via operators.qset); at TPU
    scale the resulting array must never cross the host↔device boundary —
    a 24-qubit upload costs seconds through the remote tunnel while the
    kron chain itself is microseconds of device compute.  Each ket is a
    small host array baked into the jitted build as a literal; one jit
    call materialises the full state directly in HBM.

    Small registers (< ``_DEVICE_BUILD_MIN_DIM`` amplitudes) keep the
    host complex128 kron (bit-identical to the reference's arithmetic,
    no compile churn in tests).
    """
    kets = [np.asarray(k, np.complex128).ravel() for k in kets]
    dim = 1
    for k in kets:
        dim *= k.shape[0]
    if dim < _DEVICE_BUILD_MIN_DIM:
        flat = np.array([1.0 + 0j])
        for k in kets:
            flat = np.kron(flat, k)
        flat = flat / np.linalg.norm(flat)
        return jnp.asarray(to_planar(flat, dtype))

    key = (tuple(k.tobytes() for k in kets), np.dtype(dtype).str)
    fn = _PRODUCT_CACHE.get(key)
    if fn is None:
        planar_kets = [np.stack([k.real, k.imag]).astype(dtype)
                       for k in kets]

        def build():
            r = jnp.ones((1,), dtype)
            i = jnp.zeros((1,), dtype)
            for pk in planar_kets:
                br = jnp.asarray(pk[0])
                bi = jnp.asarray(pk[1])
                nr = (r[:, None] * br[None, :]
                      - i[:, None] * bi[None, :]).reshape(-1)
                ni = (r[:, None] * bi[None, :]
                      + i[:, None] * br[None, :]).reshape(-1)
                r, i = nr, ni
            nrm = jnp.sqrt(jnp.sum(r * r + i * i))
            return jnp.stack([r, i]) / nrm

        fn = jax.jit(build)
        _PRODUCT_CACHE[key] = fn
    return fn()


def zero_state_planar(n: int, dtype=REAL_DTYPE) -> jnp.ndarray:
    psi = jnp.zeros((2, 2**n), dtype=dtype)
    return psi.at[0, 0].set(1.0)


def to_planar(psi_complex: np.ndarray, dtype=np.float32) -> np.ndarray:
    return np.stack([np.real(psi_complex), np.imag(psi_complex)]).astype(dtype)


def from_planar(psi: np.ndarray) -> np.ndarray:
    psi = np.asarray(psi)
    return psi[0] + 1j * psi[1]


# ---------------------------------------------------------------------------
# host-side static folding
# ---------------------------------------------------------------------------

def _static_term_matrix(term: Term) -> np.ndarray:
    return np.asarray(term.matrix, dtype=np.complex128)


def fold_window_static(step: WindowStep) -> Optional[np.ndarray]:
    """Fuse a window's terms into one complex matrix on the host.

    Returns None if any term is parameterised.
    """
    if any(t.matrix is None for t in step.terms):
        return None
    w, dim = step.width, 2**step.width
    W = np.eye(dim, dtype=np.complex128).reshape((2,) * w + (dim,))
    for term in step.terms:
        m = _static_term_matrix(term)
        k = len(term.positions)
        g = m.reshape((2,) * (2 * k))
        W = np.tensordot(g, W, axes=(list(range(k, 2 * k)),
                                     list(term.positions)))
        W = np.moveaxis(W, list(range(k)), list(term.positions))
    return W.reshape(dim, dim)


def _planar_pair(mat: np.ndarray, dtype=np.float32):
    return (np.ascontiguousarray(mat.real, dtype=dtype),
            np.ascontiguousarray(mat.imag, dtype=dtype))


# ---------------------------------------------------------------------------
# in-trace planar algebra (for parameterised terms)
# ---------------------------------------------------------------------------

def _planar_controlled(mr, mi, num_controls: int):
    size = mr.shape[0]
    dim = (2**num_controls) * size
    outr = jnp.eye(dim, dtype=mr.dtype)
    outr = outr.at[dim - size:, dim - size:].set(mr)
    outi = jnp.zeros((dim, dim), dtype=mi.dtype)
    outi = outi.at[dim - size:, dim - size:].set(mi)
    return outr, outi


def _term_planar(term: Term, params, dtype):
    if term.matrix is not None:
        m = np.asarray(term.matrix, dtype=np.complex128)
        return (jnp.asarray(m.real, dtype=dtype),
                jnp.asarray(m.imag, dtype=dtype))
    stacked = term.maker(params[term.param_idx])  # (2, 2^k, 2^k) planar
    mr, mi = stacked[0].astype(dtype), stacked[1].astype(dtype)
    if term.num_controls:
        mr, mi = _planar_controlled(mr, mi, term.num_controls)
    return mr, mi


def _fold_contract(gr, gi, Wr, Wi, positions):
    """One planar tensor contraction step of the window fold."""
    k = len(positions)
    ax = (list(range(k, 2 * k)), list(positions))

    def con(g, W):
        out = jnp.tensordot(g.reshape((2,) * (2 * k)), W, axes=ax,
                            precision=_PREC)
        return jnp.moveaxis(out, list(range(k)), list(positions))

    new_r = con(gr, Wr) - con(gi, Wi)
    new_i = con(gr, Wi) + con(gi, Wr)
    return new_r, new_i


def fold_window_planar(step: WindowStep, params, dtype=REAL_DTYPE):
    """(Wr, Wi) for a window with parameterised terms, folded in-trace."""
    w, dim = step.width, 2**step.width
    shape = (2,) * w + (dim,)
    Wr = jnp.eye(dim, dtype=dtype).reshape(shape)
    Wi = jnp.zeros(shape, dtype=dtype)
    for term in step.terms:
        mr, mi = _term_planar(term, params, dtype)
        k = int(np.log2(mr.shape[0]))
        Wr, Wi = _fold_contract(mr, mi, Wr, Wi, term.positions)
    return Wr.reshape(dim, dim), Wi.reshape(dim, dim)


# ---------------------------------------------------------------------------
# step application
# ---------------------------------------------------------------------------

def _apply_window_planar(psi, n: int, step: WindowStep, params):
    from qbot_tpu.tpu.kernels import planar_window_apply

    static = fold_window_static(step)
    if static is not None:
        wr, wi = _planar_pair(static)
        Wr, Wi = jnp.asarray(wr), jnp.asarray(wi)
    else:
        Wr, Wi = fold_window_planar(step, params, psi.dtype)
    return planar_window_apply(psi, n, step.start, step.width, Wr, Wi,
                               step.pre_flips, step.pre_phases)


def _fold_planar_pair(step: WindowStep, params, dtype):
    static = fold_window_static(step)
    if static is not None:
        wr, wi = _planar_pair(static)
        return jnp.asarray(wr), jnp.asarray(wi)
    return fold_window_planar(step, params, dtype)


def _apply_pair_planar(psi, n: int, step: PairStep, params):
    from qbot_tpu.tpu.kernels import planar_pair_window_apply

    W1r, W1i = _fold_planar_pair(step.first, params, psi.dtype)
    W2r, W2i = _fold_planar_pair(step.second, params, psi.dtype)
    return planar_pair_window_apply(
        psi, n, step.first.start, step.first.width,
        step.second.start, step.second.width,
        W1r, W1i, W2r, W2i, step.first.pre_flips, step.first.pre_phases)


def reflect_component(factors, index: int) -> complex:
    """Static component ``v[index]`` of the product state |v⟩ = ⊗ factors."""
    v = 1.0 + 0.0j
    shift = sum(int(f.shape[0]).bit_length() - 1 for f in factors)
    for f in factors:
        d = int(f.shape[0])
        shift -= d.bit_length() - 1
        v *= complex(np.asarray(f, np.complex128)[(index >> shift) & (d - 1)])
    return v


def _broadcast_product(factors, dims, dtype):
    """(vr, vi) of |v⟩ = ⊗ factors as broadcastable planar arrays.

    Built axis-by-axis so XLA keeps the product in-register inside whatever
    consumer it fuses into — |v⟩ is never materialised in HBM.
    """
    vr = jnp.asarray(1.0, dtype)
    vi = jnp.asarray(0.0, dtype)
    for ax, f in enumerate(factors):
        fr, fi = _planar_pair(np.asarray(f, np.complex128))
        shape = [1] * len(dims)
        shape[ax] = dims[ax]
        br = jnp.asarray(fr).reshape(shape)
        bi = jnp.asarray(fi).reshape(shape)
        vr, vi = vr * br - vi * bi, vr * bi + vi * br
    return vr, vi


def _reflect_tables(step: ReflectStep, dtype=np.float32):
    """Planar head/tail factor tables for the Pallas reflection kernels.

    |v⟩ = A ⊗ B with A = kron of all factors but the last (the 'head'),
    B = the last factor (the 'tail', lane-sized by the window partition).
    """
    head = np.ones(1, np.complex128)
    for f in step.factors[:-1]:
        head = np.kron(head, np.asarray(f, np.complex128))
    tail = np.asarray(step.factors[-1], np.complex128)
    H, T = head.shape[0], tail.shape[0]
    a = np.stack([head.real, head.imag]).astype(dtype).reshape(2, H, 1)
    b = np.stack([tail.real, tail.imag]).astype(dtype).reshape(2, 1, T)
    return jnp.asarray(a), jnp.asarray(b), H, T


def _lane_dot_to_c(d, b):
    """⟨v|ψ⟩ from the kernels' per-lane dot D: c = Σ_t conj(B_t)·D[t]."""
    cr = jnp.sum(b[0, 0] * d[0, 0] + b[1, 0] * d[1, 0])
    ci = jnp.sum(b[0, 0] * d[1, 0] - b[1, 0] * d[0, 0])
    return cr, ci


def _flip_corrections(cr, ci, p3, step: ReflectStep, T: int):
    """c ← c − 2·conj(v_m)·ψ_m for each fused flip (O(1) gathers)."""
    for m in step.pre_flips:
        vm = reflect_component(step.factors, m)
        pmr = p3[0, m // T, m % T]
        pmi = p3[1, m // T, m % T]
        cr = cr - 2.0 * (vm.real * pmr + vm.imag * pmi)
        ci = ci - 2.0 * (vm.real * pmi - vm.imag * pmr)
    return cr, ci


def _apply_reflect_planar_pallas(psi, n: int, step: ReflectStep):
    """Two-kernel reflection: one read pass (dot) + one read+write pass
    (rank-1 update with fused flips).  None if geometry/backend rules it
    out (caller falls back to the XLA formulation)."""
    from qbot_tpu.tpu import kernels

    a, b, H, T = _reflect_tables(step)
    p3 = psi.reshape(2, H, T)
    d = kernels.planar_reflect_dot(p3, a, b)
    if d is None:
        return None
    cr, ci = _lane_dot_to_c(d, b)
    cr, ci = _flip_corrections(cr, ci, p3, step, T)
    out, _ = kernels.planar_reflect_update(p3, jnp.stack([cr, ci]), a, b,
                                           step.pre_flips)
    return out.reshape(psi.shape)


def _apply_reflect_planar(psi, n: int, step: ReflectStep):
    """ψ → Fψ − 2⟨v|Fψ⟩v for product |v⟩ = ⊗ factors, F = fused sign flips.

    Differentiable: R = (I − 2vv†)F is complex-linear, so the custom VJP
    applies the adjoint R† = F(I − 2vv†) to the cotangent through the XLA
    formulation (the Pallas reflect kernels carry no AD rules) — this is
    what lets gradients flow through reflection-carrying plans (Grover-in-
    the-loss) on the planar path.
    """

    @jax.custom_vjp
    def apply(p):
        return _reflect_impl(p, n, step)

    def fwd(p):
        return _reflect_impl(p, n, step), None

    def bwd(_, g):
        return (_reflect_adjoint_xla(g, step),)

    apply.defvjp(fwd, bwd)
    return apply(psi)


def _reflect_adjoint_xla(g, step: ReflectStep):
    """R†ḡ = F(ḡ − 2⟨v|ḡ⟩v): rank-1 update, then flip signs at indices."""
    dims = tuple(f.shape[0] for f in step.factors)
    gr = g[0].reshape(dims)
    gi = g[1].reshape(dims)
    vr, vi = _broadcast_product(step.factors, dims, g.dtype)
    cr = jnp.sum(vr * gr + vi * gi)
    ci = jnp.sum(vr * gi - vi * gr)
    sr = 2.0 * (cr * vr - ci * vi)
    si = 2.0 * (cr * vi + ci * vr)
    out = jnp.stack([(gr - sr).reshape(-1), (gi - si).reshape(-1)])
    for m in step.pre_flips:
        out = out.at[:, m].multiply(-1)
    return out


def _reflect_impl(psi, n: int, step: ReflectStep):
    """Forward reflection: Pallas two-pass kernels when the geometry and
    backend allow, otherwise the fused-elementwise XLA formulation.

    Two HBM passes: the ⟨v|ψ⟩ contraction as ONE fused elementwise
    multiply-reduce over the flat state (a matmul formulation here makes
    XLA materialise a transposed-layout copy of the whole state — measured
    ~5× slower), then one fused elementwise rank-1 update.  The fused
    pre-flips (oracle) are exact O(1) scalar corrections: a flipped basis
    state shifts ⟨v|Fψ⟩ by −2·conj(v_m)·ψ_m and the output at index m by
    −2·ψ_m.
    """
    fast = _apply_reflect_planar_pallas(psi, n, step)
    if fast is not None:
        return fast

    dims = tuple(f.shape[0] for f in step.factors)
    pr = psi[0].reshape(dims)
    pi = psi[1].reshape(dims)
    vr, vi = _broadcast_product(step.factors, dims, psi.dtype)

    # c = ⟨v|ψ⟩ = Σ conj(v)·ψ — one fused read pass
    cr = jnp.sum(vr * pr + vi * pi)
    ci = jnp.sum(vr * pi - vi * pr)

    # fused-flip scalar corrections: c ← c − 2·conj(v_m)·ψ_m
    flip_vals = []
    for m in step.pre_flips:
        vm = reflect_component(step.factors, m)
        pmr, pmi = psi[0, m], psi[1, m]
        cr = cr - 2.0 * (vm.real * pmr + vm.imag * pmi)
        ci = ci - 2.0 * (vm.real * pmi - vm.imag * pmr)
        flip_vals.append((m, pmr, pmi))

    sr = 2.0 * (cr * vr - ci * vi)
    si = 2.0 * (cr * vi + ci * vr)
    out = jnp.stack([(pr - sr).reshape(-1), (pi - si).reshape(-1)])
    # output corrections at flipped indices: (Fψ)_m = −ψ_m
    for m, pmr, pmi in flip_vals:
        out = out.at[0, m].add(-2.0 * pmr)
        out = out.at[1, m].add(-2.0 * pmi)
    return out


def _diag_grouped_views(n: int, targets, diag):
    """(state view shape, broadcast dr, broadcast di) for a diagonal step.

    Groups the n qubit axes into runs of consecutive targets separated by
    gap blocks, so the state reshapes to a FEW large dims instead of
    (2,)*n — a (2,)*n view at 26 qubits made XLA materialise a tiled
    T(2,128) layout (64× padding → 32 GB alloc, compile-time OOM on TPU).
    """
    k = len(targets)
    order = sorted(range(k), key=lambda j: targets[j])
    srt = [targets[j] for j in order]
    d = np.asarray(diag, dtype=np.complex128).reshape((2,) * k)
    d = np.transpose(d, order)            # axis i ↔ srt[i]

    runs: list[tuple[int, int]] = []      # (first qubit, length)
    for q in srt:
        if runs and q == runs[-1][0] + runs[-1][1]:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((q, 1))

    view: list[int] = [2]                 # leading planar axis
    bshape: list[int] = [1]
    pos = 0
    for start, length in runs:
        if start > pos:                   # gap block
            view.append(2 ** (start - pos))
            bshape.append(1)
        view.append(2 ** length)
        bshape.append(2 ** length)
        pos = start + length
    if pos < n:                           # tail block
        view.append(2 ** (n - pos))
        bshape.append(1)
    d = d.reshape(bshape[1:])
    dr, di = _planar_pair(d)
    return tuple(view), dr, di


def _apply_diag_planar(psi, n: int, step: DiagStep):
    view, dr, di = _diag_grouped_views(n, step.targets, step.diag)
    t = psi.reshape(view)
    pr, pi = t[0], t[1]
    out_r = dr * pr - di * pi
    out_i = dr * pi + di * pr
    return jnp.stack([out_r, out_i]).reshape(psi.shape)


def _apply_contract_planar(psi, n: int, step: ContractStep, params):
    if step.matrix is not None:
        m = np.asarray(step.matrix, dtype=np.complex128)
        gr, gi = (jnp.asarray(x) for x in _planar_pair(m))
    else:
        stacked = step.maker(params[step.param_idx])
        gr, gi = stacked[0].astype(psi.dtype), stacked[1].astype(psi.dtype)
        if step.num_controls:
            gr, gi = _planar_controlled(gr, gi, step.num_controls)
    k = len(step.targets)
    ax = (list(range(k, 2 * k)), list(step.targets))

    def con(g, x):
        out = jnp.tensordot(g.reshape((2,) * (2 * k)), x, axes=ax,
                            precision=_PREC)
        return jnp.moveaxis(out, list(range(k)), list(step.targets))

    t = psi.reshape((2,) + (2,) * n)
    pr, pi = t[0], t[1]
    out_r = con(gr, pr) - con(gi, pi)
    out_i = con(gr, pi) + con(gi, pr)
    return jnp.stack([out_r, out_i]).reshape(psi.shape)


def apply_plan_planar(psi: jnp.ndarray, plan: Plan, params=None) -> jnp.ndarray:
    """Run a compiled plan over a planar (2, 2^n) statevector (traceable).

    Honours ``plan.engine == "dot"`` (set by the auto-compiler) by
    routing through the axis-scheduled dot executor; its cycle restore
    leaves the output in canonical layout, so semantics are identical.
    """
    if getattr(plan, "engine", "pallas") == "dot":
        from qbot_tpu.tpu.dotplan import apply_plan_dot, lower_dot_plan

        lowered = lower_dot_plan(plan)
        if lowered is not None:
            return apply_plan_dot(psi, lowered, params)
    n = plan.n
    for step in plan.steps:
        if isinstance(step, WindowStep):
            psi = _apply_window_planar(psi, n, step, params)
        elif isinstance(step, PairStep):
            psi = _apply_pair_planar(psi, n, step, params)
        elif isinstance(step, ReflectStep):
            psi = _apply_reflect_planar(psi, n, step)
        elif isinstance(step, DiagStep):
            psi = _apply_diag_planar(psi, n, step)
        elif isinstance(step, PhaseStep):
            psi = _apply_diag_planar(psi, n, phase_as_diag(step))
        elif isinstance(step, FlipStep):
            psi = psi.at[:, step.index].multiply(-1)
        else:
            psi = _apply_contract_planar(psi, n, step, params)
    return psi


# ---------------------------------------------------------------------------
# planar density-matrix executor
#
# The TPU backend has no complex dtypes, so this is the only way mixed
# states run on real chips: ρ is a planar (2, 2^n, 2^n) float32 stack, and
# every plan step applies to the ROW qubit axes then (conjugated) to the
# COLUMN axes.  Viewing ρ flat as a planar (2, 4^n) "state", a window on
# rows is a window at position s of a 2n-qubit register and a window on
# columns one at position n+s — the SAME Pallas window/pair kernels serve
# both sides, so density mode costs exactly 2× the statevector passes.
# ---------------------------------------------------------------------------

def zero_density_planar(n: int, dtype=REAL_DTYPE) -> jnp.ndarray:
    rho = jnp.zeros((2, 2**n, 2**n), dtype=dtype)
    return rho.at[0, 0, 0].set(1.0)


def _density_flips(rho, flips):
    """Sign-flip rows and columns of basis states (ρ → F ρ F with F=diag±1)."""
    for m in flips:
        rho = rho.at[:, m, :].multiply(-1)
        rho = rho.at[:, :, m].multiply(-1)
    return rho


def _window_both_sides(flat, n, start, width, Wr, Wi):
    from qbot_tpu.tpu.kernels import planar_window_apply

    flat = planar_window_apply(flat, 2 * n, start, width, Wr, Wi)
    return planar_window_apply(flat, 2 * n, n + start, width, Wr, -Wi)


def _pair_both_sides(flat, n, step: PairStep, W1r, W1i, W2r, W2i):
    from qbot_tpu.tpu.kernels import planar_pair_window_apply

    s1, w1 = step.first.start, step.first.width
    s2, w2 = step.second.start, step.second.width
    flat = planar_pair_window_apply(flat, 2 * n, s1, w1, s2, w2,
                                    W1r, W1i, W2r, W2i)
    return planar_pair_window_apply(flat, 2 * n, n + s1, w1, n + s2, w2,
                                    W1r, -W1i, W2r, -W2i)


def apply_plan_density_planar(rho: jnp.ndarray, plan: Plan,
                              params=None) -> jnp.ndarray:
    """Run a compiled plan over a planar (2, 2^n, 2^n) density matrix.

    Honours ``plan.engine == "dot"``: ρ flat is a 2n-qubit planar
    "state" and the step stream rewrites to a 2n-qubit plan (rows +
    conjugated columns, :func:`qbot_tpu.tpu.dotplan.density_plan_2n`)
    that the in-place dot engine executes — mixed states inherit the
    statevector engine's measured speed.
    """
    n = plan.n
    d = 2**n
    shape = rho.shape
    flat = rho.reshape(2, -1)
    if getattr(plan, "engine", "pallas") == "dot":
        from qbot_tpu.tpu.dotplan import (
            apply_plan_dot,
            density_plan_2n,
            lower_dot_plan,
        )

        big = density_plan_2n(plan)
        lowered = None if big is None else lower_dot_plan(big)
        if lowered is not None:
            return apply_plan_dot(flat, lowered, params).reshape(shape)
    from qbot_tpu.tpu.compiler import expand_phases, expand_reflections

    for step in expand_phases(expand_reflections(plan.steps)):
        if isinstance(step, WindowStep):
            if step.pre_flips:
                flat = _density_flips(flat.reshape(2, d, d),
                                      step.pre_flips).reshape(2, -1)
            static = fold_window_static(step)
            if static is not None:
                wr, wi = _planar_pair(static)
                Wr, Wi = jnp.asarray(wr), jnp.asarray(wi)
            else:
                Wr, Wi = fold_window_planar(step, params, flat.dtype)
            flat = _window_both_sides(flat, n, step.start, step.width, Wr, Wi)
        elif isinstance(step, PairStep):
            if step.first.pre_flips:
                flat = _density_flips(flat.reshape(2, d, d),
                                      step.first.pre_flips).reshape(2, -1)
            W1r, W1i = _fold_planar_pair(step.first, params, flat.dtype)
            W2r, W2i = _fold_planar_pair(step.second, params, flat.dtype)
            flat = _pair_both_sides(flat, n, step, W1r, W1i, W2r, W2i)
        elif isinstance(step, DiagStep):
            flat = _apply_diag_planar(flat, 2 * n, step)
            col = DiagStep(tuple(n + q for q in step.targets),
                           np.conj(np.asarray(step.diag)))
            flat = _apply_diag_planar(flat, 2 * n, col)
        elif isinstance(step, FlipStep):
            flat = _density_flips(flat.reshape(2, d, d),
                                  (step.index,)).reshape(2, -1)
        else:
            flat = _apply_contract_planar(flat, 2 * n, step, params)
            col = ContractStep(tuple(n + q for q in step.targets),
                               None if step.matrix is None
                               else np.conj(np.asarray(step.matrix)),
                               step.param_idx,
                               (None if step.maker is None else
                                _conj_maker(step.maker)),
                               step.num_controls)
            flat = _apply_contract_planar(flat, 2 * n, col, params)
    return flat.reshape(shape)


def _conj_maker(maker):
    """Wrap a planar (2, d, d) gate maker to produce the conjugate gate."""
    def conj(theta):
        stacked = maker(theta)
        return jnp.stack([stacked[0], -stacked[1]])
    return conj


def make_planar_density_runner(plan: Plan):
    @jax.jit
    def run(rho, params=None):
        return apply_plan_density_planar(rho, plan, params)
    return run


def planar_density_probs(rho: jnp.ndarray, targets=None,
                         n: Optional[int] = None):
    """Computation-basis outcome probabilities: the diagonal of ρ."""
    if n is None:
        n = int(np.log2(rho.shape[-1]))
    diag = jnp.diagonal(rho[0], axis1=-2, axis2=-1).reshape((2,) * n)
    if targets is None:
        return diag.reshape(-1)
    targets = sorted(targets)
    other = tuple(q for q in range(n) if q not in targets)
    marg = jnp.sum(diag, axis=other) if other else diag
    return marg.reshape(-1)


# ---------------------------------------------------------------------------
# runners and readout
# ---------------------------------------------------------------------------

def make_planar_runner(plan: Plan):
    @jax.jit
    def run(psi, params=None):
        return apply_plan_planar(psi, plan, params)
    return run


def _make_scanned_reflect_runner(step: ReflectStep, repeats: int,
                                 init_plan: Optional[Plan]):
    """Scan a pure-reflection body at ONE fused HBM pass per iteration.

    Three measured facts shape this (TPU v5e, 26 qubits):
    * XLA's fused elementwise loops move ~505 GB/s; Pallas DMA pipelines
      only ~286 GB/s here — so the hot loop is XLA, not a custom kernel.
    * Restacking the two planar components into one (2, ·) carry costs a
      full extra state copy per iteration (~2× slowdown) — so the carry
      keeps (re, im) as SEPARATE arrays and only restacks on exit.
    * XLA fuses reductions into the elementwise pass that produces their
      operand — so ⟨v|ψ_{k+1}⟩ is computed as four partial sums inside the
      update passes and carried as two scalars; the separate read pass
      runs only once, as the prologue.
    Fused oracle flips are exact: a sign pattern from broadcast iota
    comparisons (in-register) plus O(1) scalar corrections to the carry.
    """
    factors = [np.asarray(f, np.complex128) for f in step.factors]
    head = np.ones(1, np.complex128)
    for f in factors[:-1]:
        head = np.kron(head, f)
    tail = factors[-1]
    H, T = head.shape[0], tail.shape[0]
    if H < 2 or T < 2:
        return None
    Ar = jnp.asarray(head.real.astype(np.float32).reshape(H, 1))
    Ai = jnp.asarray(head.imag.astype(np.float32).reshape(H, 1))
    Br = jnp.asarray(tail.real.astype(np.float32).reshape(1, T))
    Bi = jnp.asarray(tail.imag.astype(np.float32).reshape(1, T))
    flip_info = [(m, m // T, m % T, reflect_component(step.factors, m))
                 for m in step.pre_flips]

    def sign_pattern(dtype):
        """(H,1)·(1,T) mask products — fused, never materialised.

        The barrier keeps XLA from constant-folding the iota comparisons
        into an (H, T) literal (state-sized; dominates compile time)."""
        row = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        row, col = jax.lax.optimization_barrier((row, col))
        sign = jnp.asarray(1.0, dtype)
        for _, r0, t0, _ in flip_info:
            hit = ((row == r0).astype(dtype) * (col == t0).astype(dtype))
            sign = sign * (1.0 - 2.0 * hit)
        return sign

    def correct_c(cr, ci, pr, pi):
        """c ← c − 2·conj(v_m)·ψ_m for each fused flip (O(1) gathers)."""
        for _, r0, t0, vm in flip_info:
            pmr, pmi = pr[r0, t0], pi[r0, t0]
            cr = cr - 2.0 * (vm.real * pmr + vm.imag * pmi)
            ci = ci - 2.0 * (vm.real * pmi - vm.imag * pmr)
        return cr, ci

    @jax.jit
    def run(psi, params=None):
        if init_plan is not None:
            psi = apply_plan_planar(psi, init_plan, params)
        shape = psi.shape
        pr = psi[0].reshape(H, T)
        pi = psi[1].reshape(H, T)
        # The factor tables are trace constants; without a barrier XLA
        # constant-folds every (H, T)-shaped product below into full
        # state-sized literals at COMPILE time — measured 184 s compiles at
        # 26 qubits (BENCH_r01) vs ~6 s with the barrier.  Barriered, the
        # broadcasts fuse into the elementwise passes in-register instead.
        ar, ai, br, bi = jax.lax.optimization_barrier((Ar, Ai, Br, Bi))
        # prologue: c₀ = ⟨v|Fψ₀⟩ (the only standalone read pass)
        vr = ar * br - ai * bi
        vi = ar * bi + ai * br
        cr = jnp.sum(vr * pr + vi * pi)
        ci = jnp.sum(vr * pi - vi * pr)
        cr, ci = correct_c(cr, ci, pr, pi)
        sign = sign_pattern(psi.dtype)

        def body(carry, _):
            pr, pi, cr, ci = carry
            qr = cr * br - ci * bi
            qi = cr * bi + ci * br
            # out = Fψ − 2c·(A⊗B): one fused pass per planar component,
            # each also emitting its two partial sums for the next c
            outr = sign * pr - 2.0 * (ar * qr - ai * qi)
            outi = sign * pi - 2.0 * (ar * qi + ai * qr)
            s_rr = jnp.sum((ar * br - ai * bi) * outr)
            s_ir = jnp.sum((ar * bi + ai * br) * outr)
            s_ri = jnp.sum((ar * br - ai * bi) * outi)
            s_ii = jnp.sum((ar * bi + ai * br) * outi)
            ncr, nci = correct_c(s_rr + s_ii, s_ri - s_ir, outr, outi)
            return (outr, outi, ncr, nci), None

        (pr, pi, _, _), _ = jax.lax.scan(body, (pr, pi, cr, ci), None,
                                         length=repeats)
        return jnp.stack([pr.reshape(-1), pi.reshape(-1)]).reshape(shape)
    return run


def make_scanned_planar_runner(body_plan: Plan, repeats: int,
                               init_plan: Optional[Plan] = None,
                               renorm_every: int = 0):
    if (len(body_plan.steps) == 1
            and isinstance(body_plan.steps[0], ReflectStep)
            and not renorm_every):
        fast = _make_scanned_reflect_runner(body_plan.steps[0], repeats,
                                            init_plan)
        if fast is not None:
            return fast

    if getattr(body_plan, "engine", "pallas") == "dot":
        from qbot_tpu.tpu.dotplan import make_scanned_dot_runner

        dot = make_scanned_dot_runner(body_plan, repeats, init_plan,
                                      renorm_every=renorm_every)
        if dot is not None:
            return dot

    @jax.jit
    def run(psi, params=None):
        if init_plan is not None:
            psi = apply_plan_planar(psi, init_plan, params)

        def step(carry, i):
            psi = apply_plan_planar(carry, body_plan, params)
            if renorm_every:
                tick = (i + 1) % renorm_every == 0
                scale = jnp.where(tick,
                                  jax.lax.rsqrt(jnp.sum(psi * psi)),
                                  jnp.ones((), psi.dtype))
                psi = psi * scale
            return psi, None

        psi, _ = jax.lax.scan(step, psi, jnp.arange(repeats))
        return psi
    return run


def planar_probs(psi: jnp.ndarray, targets=None, n: Optional[int] = None):
    if n is None:
        n = int(np.log2(psi.shape[-1]))
    p = (psi[0] ** 2 + psi[1] ** 2).reshape((2,) * n)
    if targets is None:
        return p.reshape(-1)
    targets = sorted(targets)
    other = tuple(q for q in range(n) if q not in targets)
    marg = jnp.sum(p, axis=other) if other else p
    return marg.reshape(-1)


def planar_norm(psi: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(psi[0] ** 2 + psi[1] ** 2)
