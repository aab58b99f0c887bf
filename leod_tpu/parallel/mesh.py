"""Device-mesh data parallelism.

The reference's only parallelism is DDP over NCCL
(reference: train.py:126-133; SURVEY.md section 2.6). The TPU-native
equivalent: a 1-D `jax.sharding.Mesh` over all chips, batch (= stream
slot) axis sharded, parameters replicated, gradient all-reduce inserted
by XLA. The recurrent state table is sharded exactly like the batch so
slot continuity is device-local; the per-slot frame gather (see
train/step.py) never crosses shards.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[:num_devices] if num_devices else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading-after-time batch axis: ev is [L, B, ...] so the
    batch axis is dim 1; everything else has batch at dim 0."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _put_sharded(v, sharding: NamedSharding):
    """device_put when the sharding is fully addressable; otherwise
    (multi-host mesh) assemble a global array from this process's local
    rows via make_array_from_process_local_data."""
    if not sharding.is_fully_addressable:
        return jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return jax.device_put(v, sharding)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict on the mesh with batch-axis sharding.
    Multi-host: `batch` holds this process's local rows (global slots
    [p*B_local, (p+1)*B_local)); the result is the global array."""
    ev_s = NamedSharding(mesh, P(None, DATA_AXIS))      # [L, B, H, W, C]
    row_s = NamedSharding(mesh, P(DATA_AXIS))           # [B, ...]
    out = {}
    for k, v in batch.items():
        if k == "ev":
            out[k] = _put_sharded(v, ev_s)
        elif k in ("is_first", "frame_t", "frame_mask", "labels"):
            out[k] = _put_sharded(v, row_s)
    return out


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = NamedSharding(mesh, P())
    if not s.is_fully_addressable:
        return jax.tree.map(
            lambda v: jax.make_array_from_process_local_data(
                s, np.asarray(v)), tree)
    return jax.device_put(tree, s)


def local_mesh(mesh: Mesh) -> Mesh:
    """This process's slice of a (possibly multi-host) 1-D mesh. Used by
    host-local computations (streaming eval postprocess) that must read
    results back with numpy: a multi-host global array is not fully
    addressable, so per-process work runs on a local mesh instead."""
    mine = [d for d in mesh.devices.reshape(-1)
            if d.process_index == jax.process_index()]
    return Mesh(np.array(mine), mesh.axis_names)


def shard_states(mesh: Mesh, states: Any) -> Any:
    """LSTM state table rows follow their batch slots.

    Multi-host: callers pass the GLOBAL-size zero table; each process
    contributes its local row block [p*B_local, (p+1)*B_local) — the
    state rows a process owns are exactly its batch slots (see
    Trainer.make_train_loader slot_offset)."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    if not s.is_fully_addressable:
        p, n = jax.process_index(), jax.process_count()

        def put(v):
            assert v.shape[0] % n == 0, (v.shape, n)
            rows = v.shape[0] // n
            return jax.make_array_from_process_local_data(
                s, np.asarray(v[p * rows:(p + 1) * rows]))
        return jax.tree.map(put, states)
    return jax.tree.map(lambda v: _put_sharded(v, s), states)
