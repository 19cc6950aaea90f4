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

__all__ = ["planar_window_apply", "set_kernel_mode", "kernel_mode"]

_MODE = "auto"          # "auto" | "on" | "off" | "interpret"


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
# left-multiply kernel: out[., i, b] = Σ_j W[i, j] · p[., j, b]
# ---------------------------------------------------------------------------

def _left_kernel_body(w_ref, p_ref, o_ref, *, flips, D, block_b):
    wr = w_ref[0]
    wi = w_ref[1]
    pr = p_ref[0, 0]
    pi = p_ref[1, 0]
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
    rr = jnp.dot(wr, pr, preferred_element_type=jnp.float32)
    ii = jnp.dot(wi, pi, preferred_element_type=jnp.float32)
    ri = jnp.dot(wr, pi, preferred_element_type=jnp.float32)
    ir = jnp.dot(wi, pr, preferred_element_type=jnp.float32)
    o_ref[0, 0] = rr - ii
    o_ref[1, 0] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_b", "flips"))
def _left_multiply(w, p, block_b: int, flips=()):
    """w: (2, D, D); p: (2, A, D, B) → (2, A, D, B)."""
    _, A, D, B = p.shape
    grid = (A, pl.cdiv(B, block_b))
    kernel = functools.partial(_left_kernel_body, flips=flips, D=D,
                               block_b=block_b)
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
        interpret=_interpret(),
    )(w, p)


# ---------------------------------------------------------------------------
# right-multiply kernel (trailing window, B == 1):
# out[., a, j] = Σ_i p[., a, i] · W[j, i]   (i.e. p @ Wᵀ)
# ---------------------------------------------------------------------------

def _right_kernel_body(w_ref, p_ref, o_ref, *, flips, D, block_a):
    wr_t = w_ref[0].T
    wi_t = w_ref[1].T
    pr = p_ref[0]
    pi = p_ref[1]
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
    rr = jnp.dot(pr, wr_t, preferred_element_type=jnp.float32)
    ii = jnp.dot(pi, wi_t, preferred_element_type=jnp.float32)
    ri = jnp.dot(pi, wr_t, preferred_element_type=jnp.float32)
    ir = jnp.dot(pr, wi_t, preferred_element_type=jnp.float32)
    o_ref[0] = rr - ii
    o_ref[1] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_a", "flips"))
def _right_multiply(w, p, block_a: int, flips=()):
    """w: (2, D, D); p: (2, A, D) → (2, A, D)."""
    _, A, D = p.shape
    grid = (pl.cdiv(A, block_a),)
    kernel = functools.partial(_right_kernel_body, flips=flips, D=D,
                               block_a=block_a)
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
        interpret=_interpret(),
    )(w, p)


def planar_window_apply(psi, n: int, start: int, width: int, Wr, Wi,
                        pre_flips=()):
    """Apply a planar window unitary to a (2, 2^n) planar state.

    ``pre_flips``: basis-state indices whose sign is flipped *before* the
    unitary (Grover-style oracles); fused into the Pallas kernel at zero
    extra HBM cost.  Chooses the Pallas kernel when enabled and the
    geometry allows; otherwise falls back to the XLA einsum formulation.
    """
    D = 2**width
    a = 2**start
    B = (2**n) // (a * D)

    if _use_pallas():
        w = jnp.stack([Wr, Wi])
        if B == 1 and a >= 8:
            p = psi.reshape(2, a, D)
            block_a = min(a, max(8, 4096 // max(D // 128, 1)))
            flips = tuple(
                ((m // D) // block_a, (m // D) % block_a, m % D)
                for m in pre_flips)
            out = _right_multiply(w, p, block_a, flips)
            return out.reshape(psi.shape)
        if B >= 128:
            p = psi.reshape(2, a, D, B)
            block_b = min(B, 2048)
            flips = tuple(
                (m // (D * B), (m % B) // block_b,
                 (m % (D * B)) // B, (m % B) % block_b)
                for m in pre_flips)
            out = _left_multiply(w, p, block_b, flips)
            return out.reshape(psi.shape)
        # awkward geometry (tiny B > 1): fall through to XLA

    if pre_flips:
        flat = psi
        for m in pre_flips:
            flat = flat.at[:, m].multiply(-1)
        psi = flat

    p3 = psi.reshape(2, a, D, -1)
    pr, pi = p3[0], p3[1]

    def mm(W, x):
        return jnp.einsum("ij,ajb->aib", W, x)

    out_r = mm(Wr, pr) - mm(Wi, pi)
    out_i = mm(Wr, pi) + mm(Wi, pr)
    return jnp.stack([out_r, out_i]).reshape(psi.shape)
