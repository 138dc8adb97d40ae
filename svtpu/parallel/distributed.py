"""Multi-host initialization glue (SURVEY.md §5.8).

The reference's only distributed story is vendored PL/DDP over NCCL
(dormant). The TPU-native equivalent is single-controller JAX: every host
calls ``initialize()`` once before any jax op, then builds meshes spanning
all hosts' devices; XLA routes collectives over ICI within a slice and DCN
across slices. Per-host data loading feeds only the local shard via
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when running under a multi-host launcher.

    No-ops (returns False) in single-process settings — safe to call
    unconditionally at entry-point top. On TPU pods the arguments are
    auto-detected from the environment; explicit values are for manual
    CPU/GPU clusters.
    """
    # Probe WITHOUT jax.process_count(): that call initializes the XLA
    # backend, after which jax.distributed.initialize() hard-errors —
    # is_initialized() is the backend-safe check.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    want_multi = (coordinator_address is not None
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                  or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not want_multi:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def local_batch_to_global(batch, mesh, axis: str = "data"):
    """Assemble a globally-sharded array from per-process local data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), batch)
