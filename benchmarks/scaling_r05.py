"""Round-5 scaling artifact: real-hardware anchor with a per-phase
breakdown of the collapse pipeline, plus the emulated weak-scaling rows.

Round-4 critique (VERDICT r4): the north-star SMC path ran at 1.07 GB/s
effective HBM (0.13% of datasheet, ~6 s per collapse event) while the
raw engine streams 390 GB/s on the same chip, and no committed artifact
broke the per-collapse wall into device compute vs dispatch vs host.
Round 5 fixed the two real causes —

1. the initial ensemble crossed the host↔device tunnel (~60 MB/s up,
   ~22 MB/s down — measured in benchmarks/diag_anchor_tx.py); it now
   builds ON DEVICE in one jitted call (init_product_sharded_ensemble);
2. the unsharded comparison leg ran fully EAGERLY (one tunnel dispatch
   per jnp primitive); its executors are now content-key jit-cached
   (inference/ensemble_exec._JIT_CACHE).

This artifact measures both legs warm (min of 4) and then re-runs the
sharded leg with ``stats["sync_phases"]=True`` — the runner drains the
device pipeline after every phase, so each bucket (init / segment /
collapse / exchange / rotate / fetch) carries its own device time: the
committed per-collapse breakdown.

Usage:
  python benchmarks/scaling_r05.py --platform tpu   # on the real chip
  python benchmarks/scaling_r05.py --out SCALING_r05.json   # emulated
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W_HBM_DATASHEET = 819e9
W_ICI = 90e9
ALPHA = 1e-6

TPU_ANCHOR = os.path.join(os.path.dirname(__file__), "..",
                          "SCALING_r05_tpu.json")


def smc_program(n: int, segment_layers: int = 1) -> str:
    """The 24q SMC workload (unchanged from rounds 3-4 for cross-round
    comparability): 4 collapse events (meas/meas/disc/meas) separated by
    H/CX entangling segments."""
    def layers(k):
        out = []
        for _ in range(k):
            for q in range(0, n, 3):
                out.append(f"gate hadamardGate ; {q}")
            for q in range(0, n - 1, 3):
                out.append(f"gate pauliXGate ; {q + 1} ; [{q}]")
        return out

    lines = [f"qset tensorExp(computation.kets[0], {n})"]
    lines += layers(segment_layers)
    lines += ["meas a ; computation ; [0]"]
    lines += layers(segment_layers)
    lines += [f"gate hadamardGate ; {n // 2}",
              f"meas b ; computation ; [{n // 2}]"]
    lines += layers(segment_layers)
    lines += [f"disc [{n - 1}]",
              "meas c ; computation ; [1, 2]"]
    return "\n".join(lines)


def run_config(mesh_shape, particles, src, stats):
    import jax

    from qbot_tpu.frontend.lowering import (
        lower_program,
        run_lowered_sharded_ensemble,
    )
    from qbot_tpu.tpu.sharding import make_mesh

    ndev = mesh_shape[0] * mesh_shape[1]
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:ndev])
    lp = lower_program(src, mid_measure=True)
    t0 = time.perf_counter()
    res, ens, perm, emesh = run_lowered_sharded_ensemble(
        lp, mesh=mesh, sample=particles, seed=0, stats=stats)
    wall = time.perf_counter() - t0
    for r in ("a", "b", "c"):
        assert abs(sum(res[r].probs) - 1.0) < 1e-3
    return wall


def tpu_main(n: int) -> None:
    """Real-chip anchor: warm walls + synced per-phase breakdown."""
    from qbot_tpu.frontend.lowering import (
        lower_program,
        run_lowered_ensemble,
    )
    from qbot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    src = smc_program(n)
    particles = 8

    # min-of-4: the shared axon service's execute latency is bursty
    # (same-code walls measured 0.85-2.6 s across minutes); min over
    # more repeats recovers the intrinsic wall
    walls = []
    for _ in range(4):
        stats: dict = {}
        walls.append(run_config((1, 1), particles, src, stats))
    sharded_wall = min(walls)

    # synced per-phase breakdown (instrumented third run, fully warm)
    bstats: dict = {"sync_phases": True}
    breakdown_wall = run_config((1, 1), particles, src, bstats)
    phases = {kk: round(v, 4)
              for kk, v in sorted(bstats["phase_walls"].items())}
    events = bstats["collapse_events"]

    uwalls = []
    for _ in range(4):
        lp = lower_program(src, mid_measure=True)
        t0 = time.perf_counter()
        run_lowered_ensemble(lp, sample=particles, seed=0)
        uwalls.append(time.perf_counter() - t0)
    unsharded_wall = min(uwalls)

    hbm_dev = bstats["hbm_bytes"]
    out = {
        "platform": "TPU v5e (real chip, axon)",
        "qubits": n,
        "particles": particles,
        "sharded_mesh1x1_wall_s": round(sharded_wall, 3),
        "unsharded_wall_s": round(unsharded_wall, 3),
        "sharding_overhead": round(sharded_wall / unsharded_wall, 3),
        "collapse_events": events,
        "num_collectives": bstats["num_collectives"],
        "per_collapse_wall_s": round(sharded_wall / events, 3),
        "hbm_bytes": int(hbm_dev),
        "measured_effective_hbm_bytes_per_s": int(hbm_dev / sharded_wall),
        "phase_breakdown_synced": {
            "note": "third run, device pipeline drained after every "
                    "phase; total exceeds the async wall because each "
                    "drain serialises a tunnel round-trip",
            "wall_s": round(breakdown_wall, 3),
            "phases_s": phases,
            "per_collapse_device_s": round(
                phases.get("collapse", 0.0) / max(events, 1), 4),
        },
    }
    text = json.dumps(out, indent=1)
    print(text)
    with open(TPU_ANCHOR, "w") as f:
        f.write(text + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=24)
    ap.add_argument("--particles-per-dev", type=int, default=2)
    ap.add_argument("--platform", default="emulated",
                    choices=["emulated", "tpu"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    n = args.qubits

    if args.platform == "tpu":
        tpu_main(n)
        return

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

    anchor = None
    w_hbm = W_HBM_DATASHEET
    if os.path.exists(TPU_ANCHOR):
        with open(TPU_ANCHOR) as f:
            anchor = json.load(f)
        measured = float(anchor["measured_effective_hbm_bytes_per_s"])
        # CONSERVATIVE for an efficiency claim means the HIGHER rate:
        # less projected compute time makes comm weigh more
        w_hbm = max(measured, W_HBM_DATASHEET)

    def project(stats, ndev):
        comm_dev = stats["comm_bytes"] / ndev
        hbm_dev = stats["hbm_bytes"] / ndev
        t_compute = hbm_dev / w_hbm
        t_comm = comm_dev / W_ICI + stats["num_collectives"] * ALPHA
        return comm_dev, hbm_dev, t_compute / (t_compute + t_comm)

    src = smc_program(n)
    results = []
    base_rate = None
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        p_axis = ndev if ndev <= 4 else 4
        q_axis = max(ndev // p_axis, 1)
        particles = args.particles_per_dev * p_axis
        stats: dict = {}
        wall = run_config((p_axis, q_axis), particles, src, stats)
        comm_dev, hbm_dev, eff = project(stats, ndev)
        per_dev = particles / wall / ndev
        if base_rate is None:
            base_rate = per_dev
        results.append({
            "devices": ndev,
            "mesh": f"{p_axis}x{q_axis}",
            "particles": particles,
            "harness_wall_s": round(wall, 2),
            "harness_weak_scaling": round(per_dev / base_rate, 3),
            "comm_bytes_per_device": int(comm_dev),
            "hbm_bytes_per_device": int(hbm_dev),
            "num_reshards": stats["num_reshards"],
            "num_collectives_exact": stats["num_collectives"],
            "collapse_events": stats["collapse_events"],
            "projected_efficiency_v5e": round(eff, 4),
        })

    # deep composed-mesh config: 4x the entangling layers between
    # collapses on the 4x2 mesh — localization comm amortises
    deep = {}
    if len(jax.devices()) >= 8:
        stats = {}
        wall = run_config((4, 2), 8, smc_program(n, segment_layers=4),
                          stats)
        comm_dev, hbm_dev, eff = project(stats, 8)
        deep = {
            "devices": 8,
            "mesh": "4x2",
            "segment_layers": 4,
            "particles": 8,
            "harness_wall_s": round(wall, 2),
            "comm_bytes_per_device": int(comm_dev),
            "hbm_bytes_per_device": int(hbm_dev),
            "num_reshards": stats["num_reshards"],
            "num_collectives_exact": stats["num_collectives"],
            "collapse_events": stats["collapse_events"],
            "projected_efficiency_v5e": round(eff, 4),
        }

    out = {
        "round": 5,
        "tpu_anchor": anchor or "absent - run scaling_r05.py --platform "
                                "tpu on the chip first",
        "smc_24q": {
            "metric": f"SMC particles over mid-measurement program, "
                      f"{n} qubits, sample mode (constant memory)",
            "platform": "cpu-emulated mesh (8 virtual devices); "
                        "projections anchored on the real-TPU row",
            "model": {
                "W_hbm_bytes_per_s": w_hbm,
                "W_hbm_source": "max(datasheet, anchor wall rate) - "
                                "conservative for an efficiency claim",
                "W_ici_bytes_per_s": W_ICI,
                "alpha_s_per_collective": ALPHA,
                "formula": "eff = t_compute / (t_compute + t_comm); "
                           "t_compute = hbm_bytes_per_device / W_hbm; "
                           "t_comm = comm_bytes_per_device / W_ici "
                           "+ n_collectives * alpha",
            },
            "results": results,
            "deep_composed_mesh": deep,
        },
    }
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
