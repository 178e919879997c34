"""Multi-host runtime initialization.

The reference is strictly single-process (`torch.cuda.set_device`,
`main.py:407`; no NCCL/MPI anywhere — SURVEY.md §2.8). Scaling past one
host here rides `jax.distributed`: every host runs the same program,
`jax.devices()` becomes the global device set, and the meshes built by
`parallel.mesh.make_mesh` span hosts — XLA routes collectives over ICI
within a slice and DCN across slices with no further code.

Call `initialize()` once per process before any other JAX call. The
training CLI (`python -m reviews4rec_tpu`) does this when
`--coordinator host:port --num_processes N --process_id I` is passed,
or when the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID env vars are set; single-host runs skip it. Input
pipeline: each host feeds only its slice of every global batch
(`mesh.host_slice` + `mesh.shard_batch`); log and checkpoint writes
happen on the primary process only (`is_primary`). The two-process CPU
integration test is tests/test_multihost.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up the cross-host runtime. Arguments fall back to the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a managed-cluster autodetect). Returns True when
    a multi-process runtime was started, False for the single-host
    no-op. Idempotent."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-host run (or a managed TPU slice where jax.distributed
        # autodetects; callers on such clusters pass num_processes=0 to
        # force the autodetect path).
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0
