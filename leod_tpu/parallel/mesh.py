"""Device-mesh parallelism: data (batch/stream-slot) x space (image H)
x model (tensor parallelism over attention heads / MLP inner dim).

The reference's only parallelism is DDP over NCCL
(reference: train.py:126-133; SURVEY.md section 2.6). The TPU-native
equivalent: a `jax.sharding.Mesh` over all chips, batch (= stream
slot) axis sharded, parameters replicated, gradient all-reduce inserted
by XLA. The recurrent state table is sharded exactly like the batch so
slot continuity is device-local; the per-slot frame gather (see
train/step.py) never crosses shards.

Beyond the reference: an optional second mesh axis shards the image
HEIGHT of activations and LSTM state tables (SPMD spatial
partitioning). XLA inserts halo exchanges for the convs and keeps the
windowed attention local when the shard boundary lands on window rows
(H/shards divisible by the partition size). This scales the dominant
memory term — TBPTT activations at 1Mpx — by 1/space per chip, which a
batch-only shard cannot do below B = num_devices.

Also beyond the reference: an optional `model` axis applies
Megatron-style tensor parallelism to the transformer blocks purely
through PARAMETER shardings (`shard_params` + GSPMD propagation — no
model-code changes): qkv / MLP-in column-parallel, out-proj / MLP-out
row-parallel, one all-reduce per block half. Targets multi-chip B=1
serving latency and single-stream activation footprints; compose as
(data, space, model).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, space: int = 1,
              model: int = 1) -> Mesh:
    """Device mesh over up to three axes: (data[, space][, model]).

    data   — batch / stream-slot sharding (gradient all-reduce).
    space  — image-height sharding (conv halo exchange), see module doc.
    model  — Megatron-style tensor parallelism over the transformer
             blocks: attention heads and the MLP inner dim are sharded
             via the parameter shardings from `shard_params`; XLA/GSPMD
             inserts the per-block all-reduces. Useful when one stream's
             latency matters more than throughput (multi-chip B=1
             serving) or when activations of a single stream exceed one
             chip, complementing `space`.

    space/model sharding is single-controller only (the multi-host
    local-row assembly below assumes one mesh axis of whole batch rows).
    """
    if num_devices is not None and num_devices > len(jax.devices()):
        raise ValueError(
            f"mesh wants {num_devices} devices, only {len(jax.devices())} "
            f"exist — silently training at a smaller parallel degree "
            f"would misreport the recipe")
    devices = jax.devices()[:num_devices] if num_devices else jax.devices()
    if space <= 1 and model <= 1:
        return Mesh(np.array(devices), (DATA_AXIS,))
    assert len(devices) % (space * model) == 0, (len(devices), space, model)
    assert jax.process_count() == 1, (
        "space/model sharding is single-controller")
    axes = [(DATA_AXIS, len(devices) // (space * model))]
    if space > 1:
        axes.append((SPACE_AXIS, space))
    if model > 1:
        axes.append((MODEL_AXIS, model))
    grid = np.array(devices).reshape([n for _, n in axes])
    return Mesh(grid, tuple(name for name, _ in axes))


def data_axis_size(mesh: Mesh) -> int:
    """Batch rows must divide THIS, not the total device count."""
    return mesh.shape[DATA_AXIS]


def _space(mesh: Mesh) -> Optional[str]:
    return SPACE_AXIS if SPACE_AXIS in mesh.axis_names else None


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
    On a (data, space) mesh the event-frame height (dim 2 in every ev
    layout: [L, B, H, W, C] raw or height-folded) is sharded too.
    Multi-host: `batch` holds this process's local rows (global slots
    [p*B_local, (p+1)*B_local)); the result is the global array."""
    ev_s = NamedSharding(mesh, P(None, DATA_AXIS, _space(mesh)))
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


# Megatron-style tensor-parallel placement for the transformer blocks,
# keyed on parameter-tree path suffixes (flax module/param names). The
# qkv projection is column-parallel (output features sharded: each model
# shard owns a contiguous block of heads — qkv output layout is
# [head, 3*dim_head], models/layers.py SelfAttention), attention and the
# head-split run shard-local, and the out-projection is row-parallel
# (input features sharded, GSPMD inserts one all-reduce per block).
# Same column/row pairing for the MLP. Everything else (convs, LSTM,
# norms, FPN, head) is replicated — the transformer blocks carry the
# bulk of the FLOPs, and the conv trunk is already shardable via the
# `space` axis. `model` should divide the smallest head count
# (stage-1 embed_dim / dim_head); misaligned degrees and the gated-MLP
# variant still compute correctly (GSPMD reshards) but pay extra
# collectives.
_TP_RULES = (
    (("attn", "qkv", "kernel"), (None, MODEL_AXIS)),
    (("attn", "qkv", "bias"), (MODEL_AXIS,)),
    (("attn", "proj", "kernel"), (MODEL_AXIS, None)),
    (("mlp", "proj_in", "kernel"), (None, MODEL_AXIS)),
    (("mlp", "proj_in", "bias"), (MODEL_AXIS,)),
    (("mlp", "proj_out", "kernel"), (MODEL_AXIS, None)),
)


def param_spec(path) -> P:
    """PartitionSpec for one parameter-tree path (tree_flatten_with_path
    keys). Applies to any tree that embeds the flax param names — the
    variables dict and optax state (mu/nu mirror the param tree) alike."""
    names = tuple(getattr(k, "key", getattr(k, "name", None)) for k in path)
    for suffix, spec in _TP_RULES:
        if names[-len(suffix):] == suffix:
            return P(*spec)
    return P()


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Place a params-bearing tree (variables / opt_state) on the mesh:
    replicated everywhere except the tensor-parallel rules above, which
    only bind when the mesh has a `model` axis."""
    if MODEL_AXIS not in mesh.axis_names:
        return replicate(mesh, tree)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = [jax.device_put(v, NamedSharding(mesh, param_spec(p)))
           for p, v in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def local_mesh(mesh: Mesh) -> Mesh:
    """This process's slice of a (possibly multi-host) 1-D mesh. Used by
    host-local computations (streaming eval postprocess) that must read
    results back with numpy: a multi-host global array is not fully
    addressable, so per-process work runs on a local mesh instead."""
    assert len(mesh.axis_names) == 1, (
        "local_mesh only supports 1-D (data-only) meshes: flattening a "
        "multi-axis mesh to one local axis would silently change the "
        "layout", mesh.axis_names)
    mine = [d for d in mesh.devices.reshape(-1)
            if d.process_index == jax.process_index()]
    return Mesh(np.array(mine), mesh.axis_names)


def shard_states(mesh: Mesh, states: Any) -> Any:
    """LSTM state table rows follow their batch slots; on a
    (data, space) mesh the state height [B, h, w, C] follows the
    activation height shards too (no resharding at the scan carry).

    Multi-host: callers pass the GLOBAL-size zero table; each process
    contributes its local row block [p*B_local, (p+1)*B_local) — the
    state rows a process owns are exactly its batch slots (see
    Trainer.make_train_loader slot_offset)."""
    s = NamedSharding(mesh, P(DATA_AXIS, _space(mesh)))
    if not s.is_fully_addressable:
        p, n = jax.process_index(), jax.process_count()

        def put(v):
            assert v.shape[0] % n == 0, (v.shape, n)
            rows = v.shape[0] // n
            return jax.make_array_from_process_local_data(
                s, np.asarray(v[p * rows:(p + 1) * rows]))
        return jax.tree.map(put, states)
    return jax.tree.map(lambda v: _put_sharded(v, s), states)
