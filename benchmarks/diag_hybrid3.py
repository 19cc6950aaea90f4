"""Probe: cross-window phases folded INTO the window dots as batch dims.

diag_hybrid2 isolated the last cost: each constant-vector phase mask is
an unfused elementwise pass (~1.7 ms, 6 per body = ~10 ms).  XLA will not
fuse elementwise producers/consumers into dot operands — but a
controlled phase CAN ride the dot itself: expose its outside-control
bits as BATCH dims of the window einsum (splitting leading axes only —
splits adjacent to the pinned minor dims are padded up to >= 8 wide) and
scale the per-slice window matrix by the phase (a scalar when the bits
are all outside; a row/column diagonal for bits inside the window).

Brickwork folds probed here (rounds 0-1 of the 12-pass body):
* CZ(6,7)  -> PRE  W3: batch g in (4) over (q6,q7) from the f axis,
              M3_g = (-1)^{g==3} M3.
* CZ(12,13)-> PRE  W4: batch p (q12, f LSB), q (q13, s MSB),
              M4_pq = (-1)^{pq} M4.
* CZ(18,19)-> POST W4 (same pass): q19 is the window's own output MSB ->
              row diagonal; q18 rides a batch r widened to 8 (q16-q18)
              so the second-minor stays >= 8.

``ref`` runs the same semantics as mask passes; ``bat`` as batched dots.
Outputs are compared (allclose) and both are timed.

Usage: python benchmarks/diag_hybrid3.py [nop,ref,bat]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache
from benchmarks.diag_hybrid import F, L, N, PREC, S, realified

K = 16


def timed(run, arg, label, passes):
    t0 = time.perf_counter()
    out = run(arg)
    _ = float(jnp.asarray(out.reshape(-1)[0]))
    tc = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.asarray(out.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    body = best / K
    per = body / passes
    gb = 2 * 2 * (2 ** N) * 4 / 1e9
    print(f"{label:4s} compile={tc:6.1f}s body={body*1e3:7.2f}ms "
          f"pass={per*1e3:6.3f}ms eff-BW={gb/per:6.1f} GB/s "
          f"g/s@154={154/body:7.1f}", flush=True)
    return out


def cz_mask(qubits):
    """Host per-axis 0/1 vectors for a CZ on ``qubits`` (qubit q is bit q
    MSB-first over the canonical register: f = q0..q12, s = q13..q18,
    l = q19..q25); the -1/+1 factor assembles by broadcast IN TRACE so
    only tiny vectors bake into the HLO."""
    spans = ((0, 13, F), (13, 19, S), (19, 26, L))
    vecs = []
    for lo, hi, sz in spans:
        v = np.ones(sz, np.float32)
        for q in qubits:
            if lo <= q < hi:
                ar = np.arange(sz)
                v = v * (((ar >> (hi - 1 - q)) & 1) == 1)
        vecs.append(jnp.asarray(v))
    return (vecs[0].reshape(F, 1, 1), vecs[1].reshape(1, S, 1),
            vecs[2].reshape(1, 1, L))


def apply_cz(p, m):
    return p * (1.0 - 2.0 * (m[0] * m[1] * m[2]))


MS = [[realified(d, 10 * w + r) for r in range(3)]
      for w, d in enumerate((128, 64, 64, 128))]
CZ67, CZ1213, CZ1819 = cz_mask((6, 7)), cz_mask((12, 13)), cz_mask((18, 19))


def body_ref(p):
    for r in range(3):
        out = jnp.einsum("xicj,cjbsl->xibsl", MS[0][r],
                         p.reshape(2, 128, F // 128, S, L), precision=PREC)
        out = jnp.einsum("xicj,cajsl->xaisl", MS[1][r],
                         out.reshape(2, 128, 64, S, L), precision=PREC)
        p = out.reshape(2, F, S, L)
        if r < 2:
            p = apply_cz(p, CZ67)
        out = jnp.einsum("xicj,cfjl->xfil", MS[2][r],
                         p.reshape(2, F, S, L), precision=PREC)
        p = out.reshape(2, F, S, L)
        if r < 2:
            p = apply_cz(p, CZ1213)
        out = jnp.einsum("xicj,cfsj->xfsi", MS[3][r],
                         p.reshape(2, F, S, L), precision=PREC)
        p = out.reshape(2, F, S, L)
        if r < 2:
            p = apply_cz(p, CZ1819)
    return p


# --- batched-fold matrices (built once, host-side) -------------------------
def m3_batched(M3):
    """(x, g=4, i, c, j): (-1)^{g==3} M3 — CZ(6,7) outside-scalar fold."""
    sc = np.array([1.0, 1.0, 1.0, -1.0], np.float32)
    return jnp.einsum("g,xicj->xgicj", jnp.asarray(sc), M3)


def m4_batched(M4):
    """(x, p, q, r, i, c, j): (-1)^{pq} M4 pre-scaled, then CZ(18,19)
    post rows: q19 = output-i MSB diag when q18 (= r LSB) is 1."""
    pq = np.array([[1.0, 1.0], [1.0, -1.0]], np.float32)       # (-1)^{p·q}
    rowd = np.ones((8, 128), np.float32)
    i_msb = (np.arange(128) >> 6) & 1
    for rv in range(8):
        if rv & 1:                    # q18 set
            rowd[rv] = np.where(i_msb == 1, -1.0, 1.0)
    return jnp.einsum("pq,ri,xicj->xpqricj", jnp.asarray(pq),
                      jnp.asarray(rowd), M4)


M3B = [m3_batched(MS[2][r]) for r in range(3)]
M4B = [m4_batched(MS[3][r]) for r in range(3)]


def body_bat(p):
    for r in range(3):
        out = jnp.einsum("xicj,cjbsl->xibsl", MS[0][r],
                         p.reshape(2, 128, F // 128, S, L), precision=PREC)
        out = jnp.einsum("xicj,cajsl->xaisl", MS[1][r],
                         out.reshape(2, 128, 64, S, L), precision=PREC)
        p = out.reshape(2, F, S, L)
        if r < 2:
            # W3 with CZ(6,7) batch: f -> (64, g=4, 32); contract j = s
            out = jnp.einsum("xgicj,cagbjl->xagbil", M3B[r],
                             p.reshape(2, 64, 4, 32, S, L), precision=PREC)
            p = out.reshape(2, F, S, L)
            # W4 with CZ(12,13) + CZ(18,19): f -> (4096, p=2),
            # s -> (q=2, u=4, r=8); contract j = lane
            out = jnp.einsum("xpqricj,capqurj->xapquri", M4B[r],
                             p.reshape(2, 4096, 2, 2, 4, 8, L),
                             precision=PREC)
            p = out.reshape(2, F, S, L)
        else:
            out = jnp.einsum("xicj,cfjl->xfil", MS[2][r],
                             p.reshape(2, F, S, L), precision=PREC)
            out = jnp.einsum("xicj,cfsj->xfsi", MS[3][r],
                             out.reshape(2, F, S, L), precision=PREC)
            p = out.reshape(2, F, S, L)
    return p


if __name__ == "__main__":
    enable_compile_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["nop", "ref", "bat"])
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, F, S, L)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p0 = jnp.asarray(psi)
    outs = {}

    if "nop" in which:
        def body_nop(p):
            for r in range(3):
                out = jnp.einsum("xicj,cjbsl->xibsl", MS[0][r],
                                 p.reshape(2, 128, F // 128, S, L),
                                 precision=PREC)
                out = jnp.einsum("xicj,cajsl->xaisl", MS[1][r],
                                 out.reshape(2, 128, 64, S, L),
                                 precision=PREC)
                out = jnp.einsum("xicj,cfjl->xfil", MS[2][r],
                                 out.reshape(2, F, S, L), precision=PREC)
                out = jnp.einsum("xicj,cfsj->xfsi", MS[3][r],
                                 out.reshape(2, F, S, L), precision=PREC)
                p = out.reshape(2, F, S, L)
            return p

        @jax.jit
        def run_nop(p):
            out, _ = jax.lax.scan(lambda c, _: (body_nop(c), None), p,
                                  None, length=K)
            return out
        timed(run_nop, p0, "nop", 12)

    for name, fn in (("ref", body_ref), ("bat", body_bat)):
        if name not in which:
            continue

        @jax.jit
        def run(p, fn=fn):
            out, _ = jax.lax.scan(lambda c, _: (fn(c), None), p, None,
                                  length=K)
            return out
        outs[name] = timed(run, p0, name, 12)

    if "ref" in outs and "bat" in outs:
        d = float(jnp.max(jnp.abs(outs["ref"] - outs["bat"])))
        print(f"max |ref - bat| = {d:.3e}", flush=True)
