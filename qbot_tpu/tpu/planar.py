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
    Plan,
    ReflectStep,
    Term,
    WindowStep,
)

__all__ = ["zero_state_planar", "to_planar", "from_planar",
           "apply_plan_planar", "make_planar_runner",
           "make_scanned_planar_runner", "planar_probs", "planar_norm",
           "zero_density_planar", "apply_plan_density_planar",
           "make_planar_density_runner", "planar_density_probs"]

REAL_DTYPE = jnp.float32


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
                               step.pre_flips)


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
        W1r, W1i, W2r, W2i, step.first.pre_flips)


def _apply_reflect_planar(psi, n: int, step: ReflectStep):
    """ψ → ψ − 2⟨v|ψ⟩v for product |v⟩ = ⊗ factors.

    One read pass (a chain of ever-smaller contractions; the first reads
    the full state once) + one fused elementwise update pass (the ⊗-product
    of factors broadcasts in-register — XLA fuses it into the update, so
    |v⟩ is never materialised in HBM).
    """
    dims = tuple(f.shape[0] for f in step.factors)
    t_r = psi[0].reshape(dims)
    t_i = psi[1].reshape(dims)
    planar_factors = []
    for f in step.factors:
        fr, fi = _planar_pair(np.asarray(f, np.complex128))
        planar_factors.append((jnp.asarray(fr), jnp.asarray(fi)))

    # c = ⟨v|ψ⟩: contract conj(f) over the leading axis repeatedly.  Each
    # step is ONE einsum mixing both planar components — the first reads
    # the full state exactly once (vs 4 separate tensordots reading it
    # twice); later steps touch ever-smaller tensors.
    t = psi
    for fr, fi in planar_factors:
        d0 = fr.shape[0]
        W = jnp.stack([jnp.stack([fr, fi]), jnp.stack([-fi, fr])])
        t = jnp.einsum("acx,cxr->ar", W, t.reshape(2, d0, -1),
                       precision=_PREC)
    cr, ci = t[0, 0], t[1, 0]

    # V = ⊗ factors, built as a broadcast product (fuses into the update)
    vr = jnp.asarray(1.0, psi.dtype)
    vi = jnp.asarray(0.0, psi.dtype)
    for ax, (fr, fi) in enumerate(planar_factors):
        shape = [1] * len(dims)
        shape[ax] = dims[ax]
        br, bi = fr.reshape(shape), fi.reshape(shape)
        vr, vi = vr * br - vi * bi, vr * bi + vi * br

    sr = 2.0 * (cr * vr - ci * vi)
    si = 2.0 * (cr * vi + ci * vr)
    out_r = t_r - sr
    out_i = t_i - si
    return jnp.stack([out_r.reshape(-1), out_i.reshape(-1)])


def _apply_diag_planar(psi, n: int, step: DiagStep):
    k = len(step.targets)
    d = np.asarray(step.diag, dtype=np.complex128)
    dr, di = _planar_pair(d)
    shape = (2,) * k + (1,) * (n - k)
    move = (list(range(k)), list(step.targets))
    dr = np.moveaxis(dr.reshape(shape), *move)
    di = np.moveaxis(di.reshape(shape), *move)
    t = psi.reshape((2,) + (2,) * n)
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
    """Run a compiled plan over a planar (2, 2^n) statevector (traceable)."""
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
    """Run a compiled plan over a planar (2, 2^n, 2^n) density matrix."""
    n = plan.n
    d = 2**n
    shape = rho.shape
    flat = rho.reshape(2, -1)
    from qbot_tpu.tpu.compiler import expand_reflections

    for step in expand_reflections(plan.steps):
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


def make_scanned_planar_runner(body_plan: Plan, repeats: int,
                               init_plan: Optional[Plan] = None):
    @jax.jit
    def run(psi, params=None):
        if init_plan is not None:
            psi = apply_plan_planar(psi, init_plan, params)

        def step(carry, _):
            return apply_plan_planar(carry, body_plan, params), None

        psi, _ = jax.lax.scan(step, psi, None, length=repeats)
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
