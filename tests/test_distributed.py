"""Multi-host execution: a real 2-process jax.distributed CPU cluster.

Exercises initialize_multihost + make_multihost_mesh + host_local_batch
(qbot_tpu/tpu/distributed.py) end-to-end: each subprocess owns 2 emulated
devices, the (2, 2) mesh spans both processes, a psum crosses the host
boundary, and one HMC training step runs with chains sharded over the
cross-host particle axis — the SURVEY.md §5 distributed-backend plan
(the reference has no distribution of any kind, SURVEY.md §2.4).
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_psum_and_hmc_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # the workers pin their own platform/device-count; scrub inherited flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    ckpt = str(tmp_path / "ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(i), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    finals = []
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("OK ")]
        assert lines, f"no OK line in worker output:\n{out}\n{err[-2000:]}"
        finals.append(lines[-1])
    # both processes must agree on the global psum (=4 devices), the
    # globally-reduced HMC result, the cross-host sharded-circuit
    # marginal, and the checkpoint round-trip
    vals = [f.split() for f in finals]
    assert float(vals[0][1]) == 4.0
    assert float(vals[1][1]) == 4.0
    assert vals[0][2] == vals[1][2]
    assert vals[0][3] == vals[1][3]      # sharded circuit probs agree
    assert vals[0][4] == "1" and vals[1][4] == "1"   # checkpoint OK
    # the cross-host sharded particle ensemble agrees between processes
    assert vals[0][5] == vals[1][5]


def test_host_local_batch_rejects_indivisible():
    import jax

    from qbot_tpu.tpu.distributed import host_local_batch
    if jax.process_count() == 1:
        assert host_local_batch(7) == 7
    else:  # pragma: no cover - single-process test env
        with pytest.raises(ValueError):
            host_local_batch(7)


def test_host_local_batch_single_host():
    from qbot_tpu.tpu.distributed import host_local_batch
    assert host_local_batch(8) == 8
