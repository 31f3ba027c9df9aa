"""Multi-host initialization for TPU pods.

The reference is single-process/single-device (SURVEY.md §2d). For pod-scale
training this framework uses jax.distributed: every host calls
`initialize()` before any jax use; the global mesh then spans all hosts'
devices (collectives ride ICI within a slice, DCN across slices), and each
host feeds only its local shard of the minibatch
(`host_local_batch_slice`).

Single-host environments (including this repo's tests and the one-chip
bench box) skip initialization and everything degrades to the local mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; returns whether
    distributed mode is active. On TPU pods the arguments are discovered
    from the environment automatically."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit is None and os.environ.get("TPU_WORKER_HOSTNAMES", "") in ("", "localhost"):
        return False  # single host
    # multi-host detected: a failed init must raise — silently degrading to
    # independent single-host runs would train divergent models
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def host_local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded minibatch."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError("global batch %d not divisible by %d hosts" % (global_batch, n))
    per_host = global_batch // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
