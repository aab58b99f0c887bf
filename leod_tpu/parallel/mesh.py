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
    """device_put for single-process; under multi-host the host holds only
    its local rows, so assemble a global array from process-local data."""
    if jax.process_count() > 1:
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
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda v: jax.make_array_from_process_local_data(
                s, np.asarray(v)), tree)
    return jax.device_put(tree, s)


def shard_states(mesh: Mesh, states: Any) -> Any:
    """LSTM state table rows follow their batch slots. Multi-host callers
    build the zero table inside jit instead (state rows are process-local
    there by construction)."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda v: _put_sharded(v, s), states)
