"""Multi-host initialization.

The reference's only process boundary is HF Accelerate's process-group
init (train_unziplora.py:1129-1139). The TPU equivalent is
jax.distributed.initialize before any backend use; afterwards the same
('data', 'frame') mesh spans all hosts and every jitted step is a single
SPMD program — XLA routes collectives over ICI within a slice and DCN
across slices.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     auto: bool = False) -> bool:
    """Initialize multi-host JAX when environment or args describe a
    multi-process topology; no-op (returns False) for single-host runs.

    On Cloud TPU pods jax.distributed.initialize() with NO arguments
    auto-populates from the metadata server — pass ``auto=True`` to
    request that path (it is not the default because a bare initialize
    on a non-pod host blocks/raises; single-chip dev boxes must stay a
    no-op). Elsewhere pass the args or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        if auto:
            jax.distributed.initialize()  # pod metadata auto-detection
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def is_main_process() -> bool:
    """True on the one process allowed to touch the filesystem
    (checkpoints, metrics, artifacts, validation images) — the
    reference gates the same writes on accelerator.is_main_process
    (train_unziplora.py:2187,2385)."""
    import jax
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process rendezvous (no-op single-process): used after a
    main-process-only filesystem write that later steps on every
    process read back (e.g. generated prior-preservation class images,
    a checkpoint to resume from). The reference's equivalent is
    accelerator.wait_for_everyone (train_unziplora.py:2384)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
