"""Pallas TPU kernels for the hot path.

The window-fused gate application is HBM-bandwidth-bound: the XLA planar
path issues 4 separate real matmuls plus combine kernels, reading each
state component twice and writing intermediates — ~3.5× the ideal traffic.
The Pallas kernel here performs the full planar complex window product

    out_re = Wr·pr − Wi·pi
    out_im = Wr·pi + Wi·pr

in a single pass: each grid instance DMAs one (D, Bt) tile of both
components into VMEM, runs the 4 small (D,D)×(D,Bt) matmuls on the MXU, and
writes both output tiles — state is read once and written once per window
step (speed-of-light for this op).

Layout: the planar state is viewed as (2, A, D, B) with D = 2^w the window
dim; the grid runs over (A, B/Bt).  For trailing windows (B < lane width)
the right-multiply variant runs on the (A, D) view instead.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Matmul precision. Mosaic's DEFAULT dot precision is single-pass bf16 —
# unacceptable for hundreds of sequential unitary applications — so the
# kernels request full f32 (6-pass bf16 decomposition) explicitly.
# "bf16_3x" is a measured ~f32-accuracy/speed tradeoff (manual Dekker
# split, 3 MXU passes, drops the lo*lo term); "bf16" is the raw fast path
# for error-tolerant exploratory runs.  "f32_mix" is the round-5
# selective mode: the dot engine drops to 3-pass bf16 ONLY on windows
# wide enough to be MXU-bound at full f32 (width >= 7 at 26q: the 6-pass
# matmul takes ~3.2 ms vs the ~2.2 ms stream floor) and keeps full f32
# everywhere else — most of bf16_3x's speed at a fraction of its error.
_DOT_MODE = "f32"                # "f32" | "f32_mix" | "bf16_3x" | "bf16"


def set_dot_mode(mode: str) -> None:
    global _DOT_MODE
    if mode not in ("f32", "f32_mix", "bf16_3x", "bf16"):
        raise ValueError(f"unknown dot mode {mode!r}")
    _DOT_MODE = mode


def dot_mode() -> str:
    return _DOT_MODE


def _dot(a, b):
    if _DOT_MODE in ("f32", "f32_mix"):
        # f32_mix is a dot-engine policy (per-window widths); the Pallas
        # kernels have no window-width context, so they stay full f32
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if _DOT_MODE == "bf16":
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

__all__ = ["planar_window_apply", "planar_pair_window_apply",
           "planar_reflect_update", "planar_reflect_dot",
           "set_kernel_mode", "kernel_mode", "set_dot_mode", "dot_mode"]

_MODE = "auto"          # "auto" | "on" | "off" | "interpret"

# Tile-geometry knobs (module-level so perf probes can sweep them).
# Grid-step fixed overhead on the axon v5e measured ~10µs; larger tiles
# amortise it at the cost of VMEM and (sometimes pathological) Mosaic
# compile time — values here are the measured sweet spots.
_PAIR_BA = 8            # _pair_b1 rows per tile
_LEFT_BLOCK_LARGE = 2048   # _left_multiply lanes when D > 32
_LEFT_BLOCK_SMALL = 512    # _left_multiply lanes when D <= 32


def set_kernel_mode(mode: str) -> None:
    """auto = Pallas on TPU backends, XLA elsewhere; interpret for tests."""
    global _MODE
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"unknown kernel mode {mode!r}")
    _MODE = mode


def kernel_mode() -> str:
    return _MODE


def _use_pallas() -> bool:
    if _MODE == "off":
        return False
    if _MODE in ("on", "interpret"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return _MODE == "interpret"


# ---------------------------------------------------------------------------
# fused controlled-phase factors
#
# Each phase entry is (re, im, scalar_bits, iota_bits) in KERNEL-local
# coordinates: ``scalar_bits`` is a tuple of (program_id axis, bit position)
# pairs and ``iota_bits`` a tuple of (iota dimension, bit position) pairs.
# The amplitude is multiplied by (re + i·im) when every listed bit is 1 —
# a handful of in-register VPU ops, replacing a standalone diagonal HBM
# pass (measured 13 ms/pass at 26 qubits — as costly as a window matmul).
# ---------------------------------------------------------------------------

def _apply_phases(pr, pi, phases, iotas):
    """Multiply (pr, pi) by each controlled-phase factor's masked value.

    Each bit spec carries ``want``: the factor triggers where the bit
    EQUALS want (controlled phases conditioned on arbitrary patterns).
    """
    for re, im, scalar_bits, iota_bits in phases:
        mask = jnp.ones_like(pr)
        here = 1
        for axis, pos, want in scalar_bits:
            bit = (pl.program_id(axis) >> pos) & 1
            here = here * (bit if want else 1 - bit)
        for dim, pos, want in iota_bits:
            bit = ((iotas[dim] >> pos) & 1).astype(pr.dtype)
            mask = mask * (bit if want else 1.0 - bit)
        mask = mask * here.astype(pr.dtype) if scalar_bits else mask
        fr = 1.0 + (re - 1.0) * mask
        fi = im * mask
        pr, pi = pr * fr - pi * fi, pr * fi + pi * fr
    return pr, pi


def _split_phase_bits(qubits, pattern: int, n: int, dim_ranges):
    """Decompose global qubit positions into kernel coordinates.

    ``dim_ranges``: ordered [(kind, key, width_log2), ...] covering the
    full index from most-significant to least-significant; kind is
    'scalar' (key = program_id axis) or 'iota' (key = iota dim).
    ``pattern``: required bit per qubit (bit k−1−j ↔ qubits[j]; −1 = all
    ones).  Returns (scalar_bits, iota_bits) of (key, pos, want) triples.
    """
    k = len(qubits)
    scalar_bits, iota_bits = [], []
    for j, q in enumerate(qubits):
        want = 1 if pattern < 0 else (pattern >> (k - 1 - j)) & 1
        p = n - 1 - q                      # bit position from LSB
        off = sum(w for _, _, w in dim_ranges)
        for kind, key, width in dim_ranges:
            off -= width
            if p >= off:
                local = p - off
                if kind == "scalar":
                    scalar_bits.append((key, local, want))
                else:
                    iota_bits.append((key, local, want))
                break
    return tuple(scalar_bits), tuple(iota_bits)


# ---------------------------------------------------------------------------
# left-multiply kernel: out[., i, b] = Σ_j W[i, j] · p[., j, b]
# ---------------------------------------------------------------------------

def _left_kernel_body(w_ref, p_ref, o_ref, *, flips, phases, D, block_b):
    wr = w_ref[0]
    wi = w_ref[1]
    pr = p_ref[0, 0]
    pi = p_ref[1, 0]
    if phases:
        row = jax.lax.broadcasted_iota(jnp.int32, (D, block_b), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (D, block_b), 1)
        pr, pi = _apply_phases(pr, pi, phases, (row, col))
    if flips:
        # fused pre-flip: negate the flipped basis states in the input tile
        row = jax.lax.broadcasted_iota(jnp.int32, (D, block_b), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (D, block_b), 1)
        sign = jnp.ones((D, block_b), dtype=pr.dtype)
        for a_star, bt_star, j_star, off_star in flips:
            here = ((pl.program_id(0) == a_star)
                    & (pl.program_id(1) == bt_star)).astype(pr.dtype)
            hit = ((row == j_star) & (col == off_star)).astype(pr.dtype)
            sign = sign * (1.0 - 2.0 * here * hit)
        pr = pr * sign
        pi = pi * sign
    rr = _dot(wr, pr)
    ii = _dot(wi, pi)
    ri = _dot(wr, pi)
    ir = _dot(wi, pr)
    o_ref[0, 0] = rr - ii
    o_ref[1, 0] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_b", "flips", "phases"))
def _left_multiply(w, p, block_b: int, flips=(), phases=()):
    """w: (2, D, D); p: (2, A, D, B) → (2, A, D, B)."""
    _, A, D, B = p.shape
    grid = (A, pl.cdiv(B, block_b))
    kernel = functools.partial(_left_kernel_body, flips=flips,
                               phases=phases, D=D, block_b=block_b)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, D, D), lambda a, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, D, block_b), lambda a, b: (0, a, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, D, block_b), lambda a, b: (0, a, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w, p)


# ---------------------------------------------------------------------------
# right-multiply kernel (trailing window, B == 1):
# out[., a, j] = Σ_i p[., a, i] · W[j, i]   (i.e. p @ Wᵀ)
#
# W arrives PRE-TRANSPOSED (wt = stack([Wr.T, Wi.T])): an in-kernel .T costs
# a Mosaic relayout that ballooned compile time from ~3 s to ~105 s on the
# axon v5e backend (measured, benchmarks/diag_probe2.py).
# ---------------------------------------------------------------------------

def _right_kernel_body(wt_ref, p_ref, o_ref, *, flips, phases, D, block_a):
    wr_t = wt_ref[0]
    wi_t = wt_ref[1]
    pr = p_ref[0]
    pi = p_ref[1]
    if phases:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_a, D), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_a, D), 1)
        pr, pi = _apply_phases(pr, pi, phases, (row, col))
    if flips:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_a, D), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_a, D), 1)
        sign = jnp.ones((block_a, D), dtype=pr.dtype)
        for at_star, a_off, j_star in flips:
            here = (pl.program_id(0) == at_star).astype(pr.dtype)
            hit = ((row == a_off) & (col == j_star)).astype(pr.dtype)
            sign = sign * (1.0 - 2.0 * here * hit)
        pr = pr * sign
        pi = pi * sign
    rr = _dot(pr, wr_t)
    ii = _dot(pi, wi_t)
    ri = _dot(pi, wr_t)
    ir = _dot(pr, wi_t)
    o_ref[0] = rr - ii
    o_ref[1] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_a", "flips", "phases"))
def _right_multiply(wt, p, block_a: int, flips=(), phases=()):
    """wt: (2, D, D) pre-transposed (Wᵀ planar); p: (2, A, D) → (2, A, D)."""
    _, A, D = p.shape
    grid = (pl.cdiv(A, block_a),)
    kernel = functools.partial(_right_kernel_body, flips=flips,
                               phases=phases, D=D, block_a=block_a)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, D, D), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, block_a, D), lambda a: (0, a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(wt, p)


# ---------------------------------------------------------------------------
# pair kernels: TWO disjoint contiguous windows in ONE HBM pass.
# State viewed as (2, A, D1, D2, B); W1 left-multiplies the D1 axis and W2
# contracts the D2 axis of the same VMEM tile — one read + one write of the
# state applies both unitaries (two passes' worth of gates at half the
# traffic of separate window steps).
# ---------------------------------------------------------------------------

def _pair_b1_body(w1_ref, w2t_ref, p_ref, o_ref, *, flips, phases, D1, D2,
                  BA):
    """Trailing pair (B == 1): tile holds BA (D1, D2) matrices; each is
    out = W1 · X · W2ᵀ in planar-complex arithmetic (8 MXU matmuls).

    W2 arrives pre-transposed and the tile carries BA > 1 rows: a 1-row
    tile made Mosaic compile this kernel in ~440 s on the axon v5e backend
    vs 1.8 s with BA=8 (measured, benchmarks/diag_probe3.py)."""
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2rt, w2it = w2t_ref[0], w2t_ref[1]
    for j in range(BA):
        xr = p_ref[0, j]
        xi = p_ref[1, j]
        if phases:
            # phase entries carry (.., row_bits_of_a_offset) where the
            # a-offset within the tile is this loop's static j: fold those
            # bits statically, keep only entries whose j-bits match
            row = jax.lax.broadcasted_iota(jnp.int32, (D1, D2), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (D1, D2), 1)
            live = []
            for re, im, scalar_bits, iota_bits, j_bits in phases:
                if all(((j >> pos) & 1) == want for pos, want in j_bits):
                    live.append((re, im, scalar_bits, iota_bits))
            xr, xi = _apply_phases(xr, xi, tuple(live), (row, col))
        row_flips = [(d1, d2) for t_star, off, d1, d2 in flips if off == j]
        if row_flips:
            row = jax.lax.broadcasted_iota(jnp.int32, (D1, D2), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (D1, D2), 1)
            sign = jnp.ones((D1, D2), dtype=xr.dtype)
            for t_star, off, d1_star, d2_star in flips:
                if off != j:
                    continue
                here = (pl.program_id(0) == t_star).astype(xr.dtype)
                hit = ((row == d1_star) & (col == d2_star)).astype(xr.dtype)
                sign = sign * (1.0 - 2.0 * here * hit)
            xr = xr * sign
            xi = xi * sign
        yr = (_dot(w1r, xr)
              - _dot(w1i, xi))
        yi = (_dot(w1r, xi)
              + _dot(w1i, xr))
        o_ref[0, j] = (_dot(yr, w2rt)
                       - _dot(yi, w2it))
        o_ref[1, j] = (_dot(yr, w2it)
                       + _dot(yi, w2rt))


@functools.partial(jax.jit, static_argnames=("flips", "phases"))
def _pair_b1(w1, w2t, p, flips=(), phases=()):
    """w1: (2, D1, D1); w2t: (2, D2, D2) pre-transposed; p: (2, A, D1, D2)."""
    _, A, D1, D2 = p.shape
    BA = min(A, _PAIR_BA)
    kernel = functools.partial(_pair_b1_body, flips=flips, phases=phases,
                               D1=D1, D2=D2, BA=BA)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(A, BA),),
        in_specs=[
            pl.BlockSpec((2, D1, D1), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D2, D2), lambda a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BA, D1, D2), lambda a: (0, a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BA, D1, D2), lambda a: (0, a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w1, w2t, p)


def _pair_bt_body(w1_ref, w2_ref, p_ref, o_ref, *, flips, phases, D1, D2,
                  block_b):
    """Middle pair (B >= 128): tile (D1, D2, Bt); W1 contracts the leading
    axis as one wide matmul, W2 the middle axis via a short D1-row loop."""
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2r, w2i = w2_ref[0], w2_ref[1]
    xr = p_ref[0, 0]
    xi = p_ref[1, 0]
    if phases:
        d1c = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 0)
        d2c = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 1)
        bc = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 2)
        xr, xi = _apply_phases(xr, xi, phases, (d1c, d2c, bc))
    if flips:
        d1c = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 0)
        d2c = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 1)
        bc = jax.lax.broadcasted_iota(jnp.int32, (D1, D2, block_b), 2)
        sign = jnp.ones((D1, D2, block_b), dtype=xr.dtype)
        for a_star, bt_star, d1_star, d2_star, off_star in flips:
            here = ((pl.program_id(0) == a_star)
                    & (pl.program_id(1) == bt_star)).astype(xr.dtype)
            hit = ((d1c == d1_star) & (d2c == d2_star)
                   & (bc == off_star)).astype(xr.dtype)
            sign = sign * (1.0 - 2.0 * here * hit)
        xr = xr * sign
        xi = xi * sign
    xr2 = xr.reshape(D1, D2 * block_b)
    xi2 = xi.reshape(D1, D2 * block_b)
    yr = (_dot(w1r, xr2)
          - _dot(w1i, xi2)
          ).reshape(D1, D2, block_b)
    yi = (_dot(w1r, xi2)
          + _dot(w1i, xr2)
          ).reshape(D1, D2, block_b)
    for j in range(D1):                 # D1 <= 32 by compile-time pairing
        ar, ai = yr[j], yi[j]           # (D2, Bt)
        o_ref[0, 0, j] = _dot(w2r, ar) - _dot(w2i, ai)
        o_ref[1, 0, j] = _dot(w2r, ai) + _dot(w2i, ar)


@functools.partial(jax.jit, static_argnames=("block_b", "flips", "phases"))
def _pair_bt(w1, w2, p, block_b: int, flips=(), phases=()):
    """w1: (2, D1, D1); w2: (2, D2, D2); p: (2, A, D1, D2, B)."""
    _, A, D1, D2, B = p.shape
    grid = (A, pl.cdiv(B, block_b))
    kernel = functools.partial(_pair_bt_body, flips=flips, phases=phases,
                               D1=D1, D2=D2, block_b=block_b)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, D1, D1), lambda a, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D2, D2), lambda a, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, D1, D2, block_b),
                         lambda a, b: (0, a, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, D1, D2, block_b),
                               lambda a, b: (0, a, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        # double-buffered (D1, D2, Bt) in+out tiles exceed the 16 MB default
        # scoped-vmem budget; the chip has 128 MB — raise the ceiling
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w1, w2, p)


# ---------------------------------------------------------------------------
# Householder-reflection kernels: ψ → Fψ − 2c·v with product |v⟩ = A ⊗ B
# (A = kron of head factors, B = tail factor).  The update is a pure-VPU
# rank-1 broadcast — one read + one write of the state (the XLA planar
# formulation costs ~3.5× that: the (2, ·) stack forces an extra full copy
# and the broadcast chain materialises v).  The same pass also accumulates
# D[t] = Σ_h conj(A_h)·out[h,t], from which the NEXT reflection's ⟨v|ψ'⟩ is
# a (T,)-sized contraction — so a scanned chain of reflections (Grover)
# costs ONE HBM pass per iteration.
# ---------------------------------------------------------------------------

def _reflect_update_body(c_ref, a_ref, b_ref, p_ref, o_ref, d_ref, *,
                         flips, RB, T):
    cr, ci = c_ref[0], c_ref[1]
    ar = a_ref[0]                      # (RB, 1)
    ai = a_ref[1]
    br = b_ref[0]                      # (1, T)
    bi = b_ref[1]
    pr = p_ref[0]
    pi = p_ref[1]
    if flips:
        row = jax.lax.broadcasted_iota(jnp.int32, (RB, T), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (RB, T), 1)
        sign = jnp.ones((RB, T), dtype=pr.dtype)
        for tile_star, row_star, lane_star in flips:
            here = (pl.program_id(0) == tile_star).astype(pr.dtype)
            hit = ((row == row_star) & (col == lane_star)).astype(pr.dtype)
            sign = sign * (1.0 - 2.0 * here * hit)
        pr = pr * sign
        pi = pi * sign
    # out = ψ − 2c·(A ⊗ B): rank-1 in each planar component
    qr = cr * br - ci * bi
    qi = cr * bi + ci * br
    outr = pr - 2.0 * (ar * qr - ai * qi)
    outi = pi - 2.0 * (ar * qi + ai * qr)
    o_ref[0] = outr
    o_ref[1] = outi
    # per-lane partial dot D[t] += Σ_h conj(A_h)·out[h,t]
    dr = jnp.sum(ar * outr + ai * outi, axis=0, keepdims=True)
    di = jnp.sum(ar * outi - ai * outr, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        d_ref[...] = jnp.zeros((2, 1, T), dtype=pr.dtype)

    d_ref[0] += dr
    d_ref[1] += di


@functools.partial(jax.jit, static_argnames=("flips",))
def _reflect_update(c, a, b, p, flips=()):
    """c: (2,); a: (2, H, 1); b: (2, 1, T); p: (2, H, T) →
    ((2, H, T), (2, 1, T))."""
    _, H, T = p.shape
    RB = min(H, 2048)
    grid = (pl.cdiv(H, RB),)
    kernel = functools.partial(_reflect_update_body, flips=flips, RB=RB, T=T)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, RB, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, T), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, RB, T), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, RB, T), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, T), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype),
                   jax.ShapeDtypeStruct((2, 1, T), p.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(c, a, b, p)


def _reflect_dot_body(a_ref, b_ref, p_ref, d_ref, *, RB, T):
    ar = a_ref[0]                      # (RB, 1)
    ai = a_ref[1]
    pr = p_ref[0]
    pi = p_ref[1]
    dr = jnp.sum(ar * pr + ai * pi, axis=0, keepdims=True)
    di = jnp.sum(ar * pi - ai * pr, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        d_ref[...] = jnp.zeros((2, 1, T), dtype=pr.dtype)

    d_ref[0] += dr
    d_ref[1] += di


@jax.jit
def _reflect_dot(a, b, p):
    """a: (2, H, 1); b: (2, 1, T); p: (2, H, T) → per-lane dot (2, 1, T)."""
    _, H, T = p.shape
    RB = min(H, 2048)
    grid = (pl.cdiv(H, RB),)
    kernel = functools.partial(_reflect_dot_body, RB=RB, T=T)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, RB, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, T), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, RB, T), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, T), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 1, T), p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(a, b, p)


def _reflect_geometry_ok(H: int, T: int) -> bool:
    return T >= 128 and T <= 512 and H >= 8


def planar_reflect_update(psi, c, a, b, flips=()):
    """One-pass reflection update: out = Fψ − 2c·(A⊗B), plus the per-lane
    dot D[t] = Σ_h conj(A_h)·out[h,t] of the RESULT (for chaining).

    psi: planar (2, H, T) view of the state; c: (2,) scalars ⟨v|Fψ⟩;
    a/b: planar (2, H)/(2, T) head/tail factor tables; flips: flat basis
    indices sign-flipped before the update.  Returns (out, D) or None when
    the kernel geometry/backend is unsupported (caller falls back to XLA).
    """
    _, H, T = psi.shape
    if not (_use_pallas() and _reflect_geometry_ok(H, T)):
        return None
    RB = min(H, 2048)
    kflips = tuple(((m // T) // RB, (m // T) % RB, m % T) for m in flips)
    out, d = _reflect_update(c, a, b, psi, kflips)
    return out, d


def planar_reflect_dot(psi, a, b):
    """Per-lane dot D[t] = Σ_h conj(A_h)·ψ[h,t] in one read pass, or None
    when unsupported.  ⟨v|ψ⟩ = Σ_t conj(B_t)·D[t] (tiny epilogue)."""
    _, H, T = psi.shape
    if not (_use_pallas() and _reflect_geometry_ok(H, T)):
        return None
    return _reflect_dot(a, b, psi)


def _phase_entries(pre_phases, n: int, dim_ranges):
    """Static kernel phase specs from global (qubits, z, pattern) factors."""
    return tuple(
        (float(np.real(z)), float(np.imag(z)))
        + _split_phase_bits(qubits, pat, n, dim_ranges)
        for qubits, z, pat in pre_phases)


def _apply_phases_xla(psi, n: int, pre_phases):
    """Fallback: apply controlled-phase factors as grouped diag passes."""
    from qbot_tpu.tpu.compiler import PhaseStep, phase_as_diag
    from qbot_tpu.tpu.planar import _apply_diag_planar

    for qubits, z, pat in pre_phases:
        psi = _apply_diag_planar(psi, n,
                                 phase_as_diag(PhaseStep(qubits, z, pat)))
    return psi


def planar_pair_window_apply(psi, n: int, s1: int, w1: int, s2: int, w2: int,
                             W1r, W1i, W2r, W2i, pre_flips=(),
                             pre_phases=()):
    """Apply two contiguous disjoint window unitaries in one HBM pass.

    ``pre_flips`` are basis-state sign flips and ``pre_phases``
    controlled-phase factors (global (qubits, z)), both applied before
    BOTH unitaries (they were fused onto the first window).  Falls back
    to two sequential window applications when Pallas is off or the
    geometry is unsupported.

    Differentiable wrt (psi, W1r, W1i, W2r, W2i) via a custom VJP (the
    Pallas pair kernels carry no AD rules): the state cotangent is one
    more pair pass with W1†, W2†, and the four matrix cotangents are
    window-sized einsums — so HMC/NUTS gradients flow through pair-fused
    plans at the tuned forward path's HBM cost.
    """
    if s1 + w1 != s2:
        raise ValueError("pair windows must be qubit-contiguous")
    return _pair_apply_ad(n, s1, w1, s2, w2, tuple(pre_flips),
                          tuple(pre_phases), psi, W1r, W1i, W2r, W2i)


def _pair_apply_impl(psi, n: int, s1: int, w1: int, s2: int, w2: int,
                     W1r, W1i, W2r, W2i, pre_flips=(), pre_phases=()):
    D1, D2 = 2**w1, 2**w2
    A = 2**s1
    B = (2**n) // (A * D1 * D2)

    if _use_pallas():
        w1s = jnp.stack([W1r, W1i])
        if B == 1:
            w2ts = jnp.stack([W2r.T, W2i.T])
            p = psi.reshape(2, A, D1, D2)
            BA = min(A, _PAIR_BA)
            lba = BA.bit_length() - 1
            flips = tuple(((m >> (w1 + w2)) // BA, (m >> (w1 + w2)) % BA,
                           (m >> w2) & (D1 - 1), m & (D2 - 1))
                          for m in pre_flips)
            # per-entry: (re, im, scalar_bits, iota_bits, j_bits) with the
            # in-tile row offset bits (the kernel's static python loop j)
            # carried separately
            phases = []
            for qubits, z, pat in pre_phases:
                sc, io = _split_phase_bits(
                    qubits, pat, n,
                    [("scalar", 0, s1 - lba), ("iota", None, lba),
                     ("iota", 0, w1), ("iota", 1, w2)])
                j_bits = tuple((pos, want) for key, pos, want in io
                               if key is None)
                io = tuple(e for e in io if e[0] is not None)
                phases.append((float(np.real(z)), float(np.imag(z)),
                               sc, io, j_bits))
            return _pair_b1(w1s, w2ts, p, flips,
                            tuple(phases)).reshape(psi.shape)
        w2s = jnp.stack([W2r, W2i])
        if B >= 128 and D1 <= 32:
            # block_b 256 compiled in >100 s on the axon backend; 128 in ~9 s
            block_b = min(B, 128)
            lb = B.bit_length() - 1
            lbb = block_b.bit_length() - 1
            p = psi.reshape(2, A, D1, D2, B)
            flips = tuple(
                (m >> (w1 + w2 + lb), (m & (B - 1)) // block_b,
                 (m >> (w2 + lb)) & (D1 - 1), (m >> lb) & (D2 - 1),
                 (m & (B - 1)) % block_b)
                for m in pre_flips)
            phases = _phase_entries(
                pre_phases, n,
                [("scalar", 0, s1), ("iota", 0, w1), ("iota", 1, w2),
                 ("scalar", 1, lb - lbb), ("iota", 2, lbb)])
            return _pair_bt(w1s, w2s, p, block_b, flips,
                            phases).reshape(psi.shape)

    if pre_phases:
        psi = _apply_phases_xla(psi, n, pre_phases)
    psi = planar_window_apply(psi, n, s1, w1, W1r, W1i, pre_flips)
    return planar_window_apply(psi, n, s2, w2, W2r, W2i)


def planar_window_apply(psi, n: int, start: int, width: int, Wr, Wi,
                        pre_flips=(), pre_phases=()):
    """Apply a planar window unitary to a (2, 2^n) planar state.

    ``pre_flips``: basis-state indices whose sign is flipped *before* the
    unitary (Grover-style oracles); ``pre_phases``: controlled-phase
    factors (qubits, z, pattern).  Both fused into the Pallas kernel at
    zero extra HBM cost.  Chooses the Pallas kernel when enabled and the
    geometry allows; otherwise falls back to the XLA einsum formulation.

    Differentiable wrt (psi, Wr, Wi) — Pallas kernels carry no AD rules,
    so a custom VJP supplies the adjoint: W†-apply for the state
    cotangent (one more window pass) and two window-sized einsums for the
    matrix cotangents.  This is what lets HMC/NUTS gradients flow through
    the real-TPU planar path.
    """
    return _window_apply_ad(n, start, width, tuple(pre_flips),
                            tuple(pre_phases), psi, Wr, Wi)


def _window_apply_impl(n: int, start: int, width: int, pre_flips,
                       pre_phases, psi, Wr, Wi):
    D = 2**width
    a = 2**start
    B = (2**n) // (a * D)

    if _use_pallas():
        if B == 1 and a >= 8:
            wt = jnp.stack([Wr.T, Wi.T])
            p = psi.reshape(2, a, D)
            block_a = min(a, max(8, 4096 // max(D // 128, 1)))
            lba = block_a.bit_length() - 1
            flips = tuple(
                ((m // D) // block_a, (m // D) % block_a, m % D)
                for m in pre_flips)
            phases = _phase_entries(
                pre_phases, n,
                [("scalar", 0, start - lba), ("iota", 0, lba),
                 ("iota", 1, width)])
            out = _right_multiply(wt, p, block_a, flips, phases)
            return out.reshape(psi.shape)
        w = jnp.stack([Wr, Wi])
        if B >= 128:
            p = psi.reshape(2, a, D, B)
            # D=32 tiles with 2048 lanes made Mosaic compile for ~460 s on
            # the axon backend; 512 lanes compile in ~1 s (diag_probe2.py)
            block_b = min(B, _LEFT_BLOCK_SMALL if D <= 32
                          else _LEFT_BLOCK_LARGE)
            lb = B.bit_length() - 1
            lbb = block_b.bit_length() - 1
            flips = tuple(
                (m // (D * B), (m % B) // block_b,
                 (m % (D * B)) // B, (m % B) % block_b)
                for m in pre_flips)
            phases = _phase_entries(
                pre_phases, n,
                [("scalar", 0, start), ("iota", 0, width),
                 ("scalar", 1, lb - lbb), ("iota", 1, lbb)])
            out = _left_multiply(w, p, block_b, flips, phases)
            return out.reshape(psi.shape)
        # awkward geometry (tiny B > 1): fall through to XLA

    if pre_phases:
        psi = _apply_phases_xla(psi, n, pre_phases)
    if pre_flips:
        flat = psi
        for m in pre_flips:
            flat = flat.at[:, m].multiply(-1)
        psi = flat

    p3 = psi.reshape(2, a, D, -1)
    pr, pi = p3[0], p3[1]

    def mm(W, x):
        return jnp.einsum("ij,ajb->aib", W, x,
                          precision=jax.lax.Precision.HIGHEST)

    out_r = mm(Wr, pr) - mm(Wi, pi)
    out_i = mm(Wr, pi) + mm(Wi, pr)
    return jnp.stack([out_r, out_i]).reshape(psi.shape)


def _apply_diagonals_xla(psi, n: int, pre_flips, pre_phases, conj=False):
    """Apply the fused diagonal prefix (signs + phases) as XLA ops.

    ``conj=True`` applies the adjoint (sign flips are real; phases
    conjugate) — used by the VJP.
    """
    if pre_phases:
        factors = (tuple((q, np.conj(z), pat) for q, z, pat in pre_phases)
                   if conj else pre_phases)
        psi = _apply_phases_xla(psi, n, factors)
    for m in pre_flips:
        psi = psi.at[:, m].multiply(-1)
    return psi


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _window_apply_ad(n, start, width, pre_flips, pre_phases, psi, Wr, Wi):
    return _window_apply_impl(n, start, width, pre_flips, pre_phases,
                              psi, Wr, Wi)


def _window_apply_fwd(n, start, width, pre_flips, pre_phases, psi, Wr, Wi):
    out = _window_apply_impl(n, start, width, pre_flips, pre_phases,
                             psi, Wr, Wi)
    return out, (psi, Wr, Wi)


def _window_apply_bwd(n, start, width, pre_flips, pre_phases, res, g):
    """Adjoint of out = W · Φ · F · ψ (Φ = fused phases, F = sign flips).

    ψ̄ = F† Φ† W† ḡ — one more window pass (the same kernel with the
    conjugate-transposed matrix) plus a cheap diagonal; W̄ comes from two
    (D, D)-sized einsums against y = Φ F ψ.
    """
    psi, Wr, Wi = res
    # W† ḡ through the same kernel dispatch (no fused diagonals)
    gW = _window_apply_impl(n, start, width, (), (), g, Wr.T, -Wi.T)
    d_psi = _apply_diagonals_xla(gW, n, pre_flips, pre_phases, conj=True)

    # y = Φ F ψ (recomputed; elementwise) for the matrix cotangents
    y = _apply_diagonals_xla(psi, n, pre_flips, pre_phases)
    D = 2**width
    a = 2**start
    g4 = g.reshape(2, a, D, -1)
    y4 = y.reshape(2, a, D, -1)
    gr, gi = g4[0], g4[1]
    yr, yi = y4[0], y4[1]

    def mm(x, z):
        return jnp.einsum("aib,ajb->ij", x, z,
                          precision=jax.lax.Precision.HIGHEST)

    d_Wr = mm(gr, yr) + mm(gi, yi)
    d_Wi = mm(gi, yr) - mm(gr, yi)
    return d_psi, d_Wr, d_Wi


_window_apply_ad.defvjp(_window_apply_fwd, _window_apply_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _pair_apply_ad(n, s1, w1, s2, w2, pre_flips, pre_phases,
                   psi, W1r, W1i, W2r, W2i):
    return _pair_apply_impl(psi, n, s1, w1, s2, w2, W1r, W1i, W2r, W2i,
                            pre_flips, pre_phases)


def _pair_apply_fwd(n, s1, w1, s2, w2, pre_flips, pre_phases,
                    psi, W1r, W1i, W2r, W2i):
    out = _pair_apply_impl(psi, n, s1, w1, s2, w2, W1r, W1i, W2r, W2i,
                           pre_flips, pre_phases)
    return out, (psi, W1r, W1i, W2r, W2i)


def _pair_apply_bwd(n, s1, w1, s2, w2, pre_flips, pre_phases, res, g):
    """Adjoint of out = (W1 ⊗ W2) · Φ · F · ψ.

    ψ̄ = F† Φ† (W1† ⊗ W2†) ḡ — one more pair pass (the same kernel with
    the conjugate-transposed matrices) plus a cheap diagonal.  Matrix
    cotangents: with y = Φ F ψ viewed as (2, A, D1, D2, B),
    out = Σ_{j,m} W1[i,j]·W2[l,m]·y[a,j,m,b], so W̄1 contracts ḡ against
    Z = y·W2 (over D2) and W̄2 against V = W1·y (over D1) — four
    full-state einsums, same order as the forward pass.
    """
    psi, W1r, W1i, W2r, W2i = res
    gW = _pair_apply_impl(g, n, s1, w1, s2, w2,
                          W1r.T, -W1i.T, W2r.T, -W2i.T)
    d_psi = _apply_diagonals_xla(gW, n, pre_flips, pre_phases, conj=True)

    y = _apply_diagonals_xla(psi, n, pre_flips, pre_phases)
    D1, D2 = 2**w1, 2**w2
    A = 2**s1
    g5 = g.reshape(2, A, D1, D2, -1)
    y5 = y.reshape(2, A, D1, D2, -1)
    gr, gi = g5[0], g5[1]
    yr, yi = y5[0], y5[1]
    prec = jax.lax.Precision.HIGHEST

    def c2(W, x):                        # Z[a,j,l,b] = Σ_m W[l,m]·x[a,j,m,b]
        return jnp.einsum("lm,ajmb->ajlb", W, x, precision=prec)

    Zr = c2(W2r, yr) - c2(W2i, yi)
    Zi = c2(W2r, yi) + c2(W2i, yr)

    def m1(x, z):                        # W̄1[i,j] from (a,i,l,b)·(a,j,l,b)
        return jnp.einsum("ailb,ajlb->ij", x, z, precision=prec)

    d_W1r = m1(gr, Zr) + m1(gi, Zi)
    d_W1i = m1(gi, Zr) - m1(gr, Zi)

    def c1(W, x):                        # V[a,i,m,b] = Σ_j W[i,j]·x[a,j,m,b]
        return jnp.einsum("ij,ajmb->aimb", W, x, precision=prec)

    Vr = c1(W1r, yr) - c1(W1i, yi)
    Vi = c1(W1r, yi) + c1(W1i, yr)

    def m2(x, v):                        # W̄2[l,m] from (a,i,l,b)·(a,i,m,b)
        return jnp.einsum("ailb,aimb->lm", x, v, precision=prec)

    d_W2r = m2(gr, Vr) + m2(gi, Vi)
    d_W2i = m2(gi, Vr) - m2(gr, Vi)
    return d_psi, d_W1r, d_W1i, d_W2r, d_W2i


_pair_apply_ad.defvjp(_pair_apply_fwd, _pair_apply_bwd)
