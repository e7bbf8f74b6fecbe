"""Multi-host initialization.

The reference's multi-node story is dead config stubs
(``--local_rank/--world_size`` flags and ``dist_url tcp://…`` / ``nccl``
entries that were never wired — SURVEY §2.4). The TPU-native equivalent is
one call: ``jax.distributed.initialize`` connects the hosts, after which the
same ('data','model') mesh spans every slice — DP gradients all-reduce over
ICI within a slice and DCN across slices, with zero changes to the training
step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host run when configured; no-op otherwise.

    Resolution order: explicit args → env (``COORDINATOR_ADDRESS``,
    ``NUM_PROCESSES``, ``PROCESS_ID``) → TPU-pod auto-detection (all three
    None on a TPU pod lets JAX discover the topology). Returns True when a
    multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-process unless running on a TPU pod slice, where JAX can
        # auto-detect. Only attempt when the TPU runtime hints exist.
        if "TPU_WORKER_HOSTNAMES" in os.environ and os.environ.get(
                "TPU_WORKER_HOSTNAMES") not in ("", "localhost"):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
