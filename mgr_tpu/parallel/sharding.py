"""Sharding rules: how params and batches map onto the mesh.

Tensor parallelism for the LSTM uses the gate-blocked weight layout
(mgr_tpu.ops.lstm): W (D, F, 4, H), U (D, H, 4, H), b (D, 4, H) all
shard their trailing H axis over ``model``. Each device then owns all
four gates for a contiguous block of hidden units; the recurrent
contraction over the carry's (sharded) H axis makes XLA insert the
per-step psum over the model axis — Megatron-style RNN TP without any
hand-written collective.

Batches shard their leading (batch) axis over ``data``. Everything else
(dense heads, conv kernels, optimizer scalars) is replicated.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def batch_pspec(mesh: Mesh) -> P:
    data_axis = mesh.axis_names[0]
    return P(data_axis)


def dp_only(mesh: Mesh) -> bool:
    """True when every non-leading axis is trivial — the mesh is pure
    data parallelism. Pure-DP meshes take the shard_map train step that
    keeps the fused Pallas kernels engaged per device; meshes with a
    real model/time axis use the GSPMD path (XLA scan kernels)."""
    data_axis = mesh.axis_names[0]
    return all(
        size == 1
        for name, size in mesh.shape.items()
        if name != data_axis
    )


def shardmap_axes(mesh: Mesh):
    """(data_axis, model_axis_or_None) when the mesh is served by the
    shard_map fast path: pure DP, or DP x a size-2 'model' axis
    (direction-sharded TP — each device runs one BLSTM direction with
    the fused single-direction kernel). Returns None when the mesh needs
    the GSPMD path (model axis != 2, or a non-trivial time axis: the
    sequence-parallel projection sharding only exists under GSPMD)."""
    data_axis = mesh.axis_names[0]
    model_axis = None
    for name, size in mesh.shape.items():
        if name == data_axis or size == 1:
            continue
        if name == "model" and size == 2:
            model_axis = name
        else:
            return None
    return data_axis, model_axis


def _leaf_pspec(path: str, leaf, model_axis: str) -> P:
    """Sharding rule for a single parameter leaf, keyed by its name/rank."""
    ndim = getattr(leaf, "ndim", 0)
    name = path.split("/")[-1]
    if name == "W" and ndim == 4:  # (D, F, 4, H) bilstm kernel
        return P(None, None, None, model_axis)
    if name == "U" and ndim == 4:  # (D, H, 4, H) recurrent kernel
        return P(None, None, None, model_axis)
    if name == "b" and ndim == 3:  # (D, 4, H) bilstm bias
        return P(None, None, model_axis)
    return P()  # replicate


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspecs(params: Params, mesh: Mesh) -> Params:
    """PartitionSpec pytree matching ``params``.

    Meshes served by the shard_map fast path (:func:`shardmap_axes`)
    replicate everything: pure DP replicates by definition, and the
    direction-sharded TP path shards COMPUTE (one scan direction per
    model-axis device), not weight storage — the stacked (2, ...) BLSTM
    params are a few MB and each device dynamically gathers its slot.
    The H-sharding rules below only apply to GSPMD meshes."""
    if shardmap_axes(mesh) is not None:
        return jax.tree.map(lambda _: P(), params)
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    model_size = mesh.shape.get(model_axis, 1) if model_axis else 1

    def rule(path, leaf):
        if model_axis is None or model_size == 1:
            return P()
        spec = _leaf_pspec(_path_str(path), leaf, model_axis)
        # Only shard if the annotated axis divides evenly.
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % model_size != 0:
                return P()
        return spec

    return jax.tree_util.tree_map_with_path(rule, params)


def param_shardings(params: Params, mesh: Mesh) -> Params:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(params, mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place parameters on the mesh according to the TP rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch on the mesh: batch axis over ``data``; for
    (B, T, ...) sequence arrays the time axis additionally shards over
    ``time`` when the mesh has one (sequence parallelism for the
    pointwise/projection stages — XLA all-gathers T before the serial
    recurrence)."""
    data_axis = mesh.axis_names[0]
    time_axis = None
    if "time" in mesh.axis_names and mesh.shape.get("time", 1) > 1:
        time_axis = "time"

    def place(x):
        if time_axis is not None and getattr(x, "ndim", 0) >= 3:
            spec = P(data_axis, time_axis)
        else:
            spec = P(data_axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, batch)
