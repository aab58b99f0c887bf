"""Multi-host (multi-process) support.

The reference runs DDP over NCCL across GPUs and shards evaluation by
global rank (reference: train.py:126-133,
data/utils/stream_sharded_datapipe.py:88-105). The JAX equivalent: one
`jax.distributed.initialize()` per host, a global mesh over all chips,
and host loaders that deal sequences by `jax.process_index()`.

Single-host usage is unaffected: every helper degrades to the trivial
1-process case.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host.

    No-ops when the environment describes a single process. Arguments
    fall back to the standard JAX env vars / cluster auto-detection."""
    n = num_processes if num_processes is not None else int(
        os.environ.get("LEOD_NUM_PROCESSES", "1"))
    if n <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_shard() -> tuple:
    """(shard_index, num_shards) for host-side data sharding."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> slice:
    """The rows of the global batch this process feeds.

    Stream-slot identity stays global: process p owns slots
    [p*B_local, (p+1)*B_local)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    b_local = global_batch // n
    p = jax.process_index()
    return slice(p * b_local, (p + 1) * b_local)
