"""Multi-host (multi-process) SPMD initialization.

Single-host multi-chip needs nothing: ``jax.devices()`` sees the whole
slice and the ('data','model') mesh covers it.  Multi-HOST slices (or
DCN-connected multi-slice) additionally need every process to join the
same JAX runtime before any backend use — that is
``jax.distributed.initialize``.

``maybe_initialize`` is a no-op when no coordinator is configured, so the
same entry points work from a laptop CPU to a pod:

* explicit: ``distributed.coordinator_address`` etc. in the config;
* automatic: on Cloud TPU pods / SLURM / OpenMPI, jax's own cluster
  detection fills everything in (initialize() with no args).

Data layout contract in this framework under multi-host: every process
loads the full (small) split and builds identical epoch index arrays from
the shared seed; the mesh's 'data' axis spans all processes, so each
process's addressable shard of a batch-sharded index array selects its
own rows — no cross-host data exchange in the input pipeline, gradient
all-reduce rides ICI/DCN via XLA collectives.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process runtime if configured; returns True if so.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS env (with
    JAX_NUM_PROCESSES/JAX_PROCESS_ID) > jax auto-detection when
    JAX_AUTO_DISTRIBUTED=1.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if os.environ.get("JAX_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # cluster auto-detection
        return True
    return False


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
