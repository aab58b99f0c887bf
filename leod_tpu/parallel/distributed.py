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


def _pack_buffers(evaluator) -> bytes:
    import pickle
    return pickle.dumps((evaluator.labels, evaluator.predictions))


def _unpack_into(evaluator, blob: bytes) -> None:
    import pickle
    labels, preds = pickle.loads(blob)
    evaluator.labels.extend(labels)
    evaluator.predictions.extend(preds)


def allgather_evaluator(evaluator) -> None:
    """Merge every process's PropheseeEvaluator buffers into the local
    one, so each host computes identical exact COCO metrics (replaces
    the reference's rank-averaged `log_dict(sync_dist=True)`,
    modules/detection.py:451-456). No-op single-process.

    Buffers are host-side ragged lists, so they travel as padded byte
    blobs through one device all-gather."""
    if jax.process_count() <= 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(_pack_buffers(evaluator), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([blob.size], np.int64)).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[:blob.size] = blob
    blobs = multihost_utils.process_allgather(padded)
    me = jax.process_index()
    for p in range(jax.process_count()):
        if p == me:
            continue
        _unpack_into(evaluator, blobs[p, :int(sizes[p])].tobytes())
