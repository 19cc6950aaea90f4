"""Probe: validate the round-4 hybrid dot-engine schedule on real hardware.

Hypothesis (docs/perf.md + VERDICT r3): the 4-layer brickwork body can
run in 12 pinned-tail dot passes — windows (0,7),(7,6),(13,6),(19,7)
with all-odd boundaries so odd brickwork layers never force a flush —
with cross-window CZ phases applied as EPILOGUE masks on the previous
dot's output (elementwise consumers fuse into a dot's epilogue; the
shipped producer-side masks cost an unfused extra pass each).

Expected: ~12 x 2.9 ms = ~35 ms/body => ~4,400 gates/s at the bench's
154 gates/body, vs the shipped dot engine's 2,130 and Pallas's 2,479.

Variants:
* hyb   — 12-pass body, epilogue phases after rounds 1-2 windows.
* hybpre— same passes, phases as producer-side masks (shipped style),
          isolating the epilogue-fusion win.
* tails — chained sub(6)/lane(7) tail-window passes only, per-pass cost
          of the in-place transposed-output contractions with S=64.

Usage: PYTHONPATH=. python benchmarks/diag_hybrid.py [hyb,hybpre,tails]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qbot_tpu.utils.compile_cache import enable_compile_cache

N = 26
K = 16                    # scanned bodies per timed call
PREC = jax.lax.Precision.HIGHEST
F, S, L = 2 ** 13, 2 ** 6, 2 ** 7      # pinned carrier (front, sub, lane)


def realified(d, seed):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, r = np.linalg.qr(z)
    U = q * (np.conj(r.diagonal() / np.abs(r.diagonal())))
    Wr, Wi = np.real(U).astype(np.float32), np.imag(U).astype(np.float32)
    M = np.zeros((2, d, 2, d), dtype=np.float32)
    M[0, :, 0, :] = Wr
    M[0, :, 1, :] = -Wi
    M[1, :, 0, :] = Wi
    M[1, :, 1, :] = Wr
    return jnp.asarray(M)


def mask_vecs(seed):
    """Host-precomputed per-axis 0/1 mask vectors for one CZ phase."""
    rng = np.random.default_rng(seed)
    mf = (rng.random(F) < 0.25).astype(np.float32)
    ms = (rng.random(S) < 0.5).astype(np.float32)
    ml = (rng.random(L) < 0.5).astype(np.float32)
    return (jnp.asarray(mf).reshape(F, 1, 1),
            jnp.asarray(ms).reshape(1, S, 1),
            jnp.asarray(ml).reshape(1, 1, L))


def apply_mask(t, masks):
    """Multiply a (2, F, S, L)-viewable tensor by (1 - 2*mask): a CZ-like
    sign flip wherever all three mask bits are 1 (real factor keeps the
    planar algebra trivial; the fusion behavior is what's probed)."""
    mf, ms, ml = masks
    m = 1.0 - 2.0 * (mf * ms * ml)
    return (t.reshape(2, F, S, L) * m).reshape(t.shape)


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
    print(f"{label:7s} compile={tc:6.1f}s body={body*1e3:7.2f}ms "
          f"pass={per*1e3:6.3f}ms eff-BW={gb/per:6.1f} GB/s "
          f"g/s@154={154/body:7.1f}", flush=True)


def make_body(with_phases, epilogue):
    """One 4-layer brickwork body: 3 rounds of 4 windows.

    Window matrices differ per round (as in the real plan).  Front
    windows W1 [0,7) / W2 [7,13) alternate a 2-cycle permutation; the
    body's last W2 restores canonical order via a transposed-output
    einsum so lax.scan can carry a fixed layout.
    """
    M1 = [realified(128, 10 + r) for r in range(3)]
    M2 = [realified(64, 20 + r) for r in range(3)]
    M3 = [realified(64, 30 + r) for r in range(3)]
    M4 = [realified(128, 40 + r) for r in range(3)]
    masks = [mask_vecs(50 + i) for i in range(6)]

    def body(p):
        mi = iter(masks if with_phases else [])

        def maybe_mask(t, use):
            if not with_phases or not use:
                return t
            return apply_mask(t, next(mi))

        for r in range(3):
            canon = (r % 2 == 0)       # perm state entering the round
            # W1 [0,7): canonical -> at front already; else at 6..12
            if canon:
                out = jnp.einsum("xicj,cjbsl->xibsl", M1[r],
                                 p.reshape(2, 128, F // 128, S, L),
                                 precision=PREC)
            else:
                out = jnp.einsum("xicj,cajsl->xiasl", M1[r],
                                 p.reshape(2, 64, 128, S, L),
                                 precision=PREC)
            p = out.reshape(2, F, S, L)
            # after W1 moves to front the perm is canonical
            # W2 [7,13) at positions 7..12
            last = (r == 2)
            if not last:
                out = jnp.einsum("xicj,cajsl->xiasl", M2[r],
                                 p.reshape(2, 128, 64, S, L),
                                 precision=PREC)
            else:                      # restore: keep canonical order
                out = jnp.einsum("xicj,cajsl->xaisl", M2[r],
                                 p.reshape(2, 128, 64, S, L),
                                 precision=PREC)
            p = out.reshape(2, F, S, L)
            use_ph = r < 2             # rounds 1-2 carry the CZ phases
            if epilogue:
                p = maybe_mask(p, use_ph)
            # W3 [13,19): sub window, in place
            q = p if epilogue else maybe_mask(p, use_ph)
            out = jnp.einsum("xicj,cfjl->xfil", M3[r],
                             q.reshape(2, F, S, L), precision=PREC)
            p = out.reshape(2, F, S, L)
            if epilogue:
                p = maybe_mask(p, use_ph)
            # W4 [19,26): lane window, in place
            q = p if epilogue else maybe_mask(p, use_ph)
            out = jnp.einsum("xicj,cfsj->xfsi", M4[r],
                             q.reshape(2, F, S, L), precision=PREC)
            p = out.reshape(2, F, S, L)
            if epilogue:
                p = maybe_mask(p, use_ph)
            elif use_ph:
                p = maybe_mask(p, use_ph)
        return p
    return body


if __name__ == "__main__":
    enable_compile_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["hyb", "hybpre", "tails"])
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, F, S, L)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    p0 = jnp.asarray(psi)

    if "hyb" in which:
        bfn = make_body(True, True)

        @jax.jit
        def run_hyb(p):
            out, _ = jax.lax.scan(lambda c, _: (bfn(c), None), p, None,
                                  length=K)
            return out
        timed(run_hyb, p0, "hyb", 12)

    if "hybpre" in which:
        bfn = make_body(True, False)

        @jax.jit
        def run_pre(p):
            out, _ = jax.lax.scan(lambda c, _: (bfn(c), None), p, None,
                                  length=K)
            return out
        timed(run_pre, p0, "hybpre", 12)

    if "tails" in which:
        M3 = realified(64, 3)
        M4 = realified(128, 4)

        @jax.jit
        def run_tails(p):
            def b(c, _):
                out = jnp.einsum("xicj,cfjl->xfil", M3,
                                 c.reshape(2, F, S, L), precision=PREC)
                out = jnp.einsum("xicj,cfsj->xfsi", M4,
                                 out.reshape(2, F, S, L), precision=PREC)
                return out.reshape(2, F, S, L), None
            out, _ = jax.lax.scan(b, p, None, length=K * 6)
            return out
        timed(run_tails, p0, "tails", 12)
