"""Multi-host initialisation — the reference's ``MPI_Init`` analogue.

The reference launches one MPI rank per node (main.cpp:36-48); the TPU
engine launches one process per host with ``jax.distributed`` and the 1-D
mesh then spans every chip of the pod slice (ICI within a slice, DCN
across slices).  The SPMD join (engine/distributed.py) is topology-agnostic:
the same jitted function runs on 1 chip, 1 host, or N hosts — XLA routes
the all_to_all/psum over whatever interconnect the mesh axis crosses.

Single-host (or the CI virtual mesh) needs none of this; call
:func:`initialize` only under a multi-host launcher.

Typical launch (one command per host):

  python -m radixjoin_tpu.main --distributed --tuples ... \
      (with RADIXJOIN_COORDINATOR=host0:8476 RADIXJOIN_NUM_PROCESSES=N
       RADIXJOIN_PROCESS_ID=i in the environment)
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialise jax.distributed from args or RADIXJOIN_* env vars.

    Returns True if multi-host mode was initialised; False for single-host
    runs (no coordinator configured).  Mirrors MPI_Init's role in
    main.cpp:36-40 — after this, ``jax.devices()`` spans all hosts and the
    engine's mesh covers the full slice.
    """
    coordinator = coordinator or os.environ.get("RADIXJOIN_COORDINATOR")
    if not coordinator:
        return False
    num_processes = num_processes or int(
        os.environ.get("RADIXJOIN_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("RADIXJOIN_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) — the reference's (rank, size),
    main.cpp:47-48."""
    return jax.process_index(), jax.process_count()
