"""Multi-host initialisation and DCN-aware mesh construction.

The reference has no distribution of any kind (SURVEY.md §2.4).  Scaling
past one host uses ``jax.distributed`` + the same (particles, qubits) mesh
spanning hosts, laid out so amplitude reshards ride ICI within a slice and
only the small particle-axis weight reductions cross DCN.

Untestable without multiple hosts in this environment; the single-host path
degrades to :func:`qbot_tpu.tpu.sharding.make_mesh`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax

from qbot_tpu.tpu.sharding import make_mesh

__all__ = ["initialize_multihost", "make_multihost_mesh", "host_local_batch"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op if single)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(particles_per_host: int = 1,
                        axis_names=("particles", "qubits")):
    """Global mesh with the particle axis spanning hosts.

    Devices are ordered host-major by jax.devices(), so reshaping
    (num_hosts·particles_per_host, qubit_shards) keeps each host's devices
    contiguous on the qubit axis — amplitude collectives stay intra-host
    (ICI) and only particle-axis psums cross DCN.
    """
    devices = np.asarray(jax.devices())
    num_hosts = jax.process_count()
    total_particles = num_hosts * particles_per_host
    if devices.size % total_particles:
        raise ValueError(
            f"{devices.size} devices not divisible into {total_particles} "
            f"particle rows")
    return make_mesh((total_particles, devices.size // total_particles),
                     axis_names=axis_names)


def host_local_batch(global_batch: int) -> int:
    """Per-host share of a global particle batch."""
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{count} hosts")
    return global_batch // count
