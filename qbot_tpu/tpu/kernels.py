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

def _left_kernel(w_ref, p_ref, o_ref):
    wr = w_ref[0]
    wi = w_ref[1]
    pr = p_ref[0, 0]
    pi = p_ref[1, 0]
    rr = jnp.dot(wr, pr, preferred_element_type=jnp.float32)
    ii = jnp.dot(wi, pi, preferred_element_type=jnp.float32)
    ri = jnp.dot(wr, pi, preferred_element_type=jnp.float32)
    ir = jnp.dot(wi, pr, preferred_element_type=jnp.float32)
    o_ref[0, 0] = rr - ii
    o_ref[1, 0] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_b",))
def _left_multiply(w, p, block_b: int):
    """w: (2, D, D); p: (2, A, D, B) → (2, A, D, B)."""
    _, A, D, B = p.shape
    grid = (A, pl.cdiv(B, block_b))
    return pl.pallas_call(
        _left_kernel,
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

def _right_kernel(w_ref, p_ref, o_ref):
    wr_t = w_ref[0].T
    wi_t = w_ref[1].T
    pr = p_ref[0]
    pi = p_ref[1]
    rr = jnp.dot(pr, wr_t, preferred_element_type=jnp.float32)
    ii = jnp.dot(pi, wi_t, preferred_element_type=jnp.float32)
    ri = jnp.dot(pi, wr_t, preferred_element_type=jnp.float32)
    ir = jnp.dot(pr, wi_t, preferred_element_type=jnp.float32)
    o_ref[0] = rr - ii
    o_ref[1] = ri + ir


@functools.partial(jax.jit, static_argnames=("block_a",))
def _right_multiply(w, p, block_a: int):
    """w: (2, D, D); p: (2, A, D) → (2, A, D)."""
    _, A, D = p.shape
    grid = (pl.cdiv(A, block_a),)
    return pl.pallas_call(
        _right_kernel,
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


def planar_window_apply(psi, n: int, start: int, width: int, Wr, Wi):
    """Apply a planar window unitary to a (2, 2^n) planar state.

    Chooses the Pallas kernel when enabled and the geometry allows;
    otherwise falls back to the XLA einsum formulation.  Returns the new
    (2, 2^n) state.
    """
    D = 2**width
    a = 2**start
    B = (2**n) // (a * D)

    if _use_pallas():
        w = jnp.stack([Wr, Wi])
        if B == 1 and a >= 8:
            p = psi.reshape(2, a, D)
            block_a = min(a, max(8, 4096 // max(D // 128, 1)))
            out = _right_multiply(w, p, block_a)
            return out.reshape(psi.shape)
        if B >= 128:
            p = psi.reshape(2, a, D, B)
            block_b = min(B, 2048)
            out = _left_multiply(w, p, block_b)
            return out.reshape(psi.shape)
        # awkward geometry (tiny B > 1): fall through to XLA

    p3 = psi.reshape(2, a, D, -1)
    pr, pi = p3[0], p3[1]

    def mm(W, x):
        return jnp.einsum("ij,ajb->aib", W, x)

    out_r = mm(Wr, pr) - mm(Wi, pi)
    out_i = mm(Wr, pi) + mm(Wi, pr)
    return jnp.stack([out_r, out_i]).reshape(psi.shape)
