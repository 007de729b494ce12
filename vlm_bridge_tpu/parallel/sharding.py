"""Device mesh + sharding rules.

Design (scaling-book recipe): pick a mesh, annotate param/batch shardings,
let XLA's GSPMD partitioner insert the collectives over ICI.

Axes:
  "data"  — batch dim of activations; bridge gradients are psum'd over it
            (data-parallel bridge training, the BASELINE v5e-8 target)
  "model" — optional tensor parallelism for the frozen Gemma decoder
            (attention heads + FFN intermediate sharded; needed for the
            Gemma-2-9B scaled variant where replicated weights would not fit)

The trainable bridge is replicated: 158M params is small, and replicating
keeps its AdamW update local (only grad psum crosses chips).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def auto_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# Path-pattern -> PartitionSpec rules for the frozen LM under tensor
# parallelism. Paths are "/"-joined pytree keys, e.g.
# "lm/layers/3/attn/q". First match wins; default is replicated.
_LM_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"lm/layers/\d+/attn/[qkv]$", P(None, "model")),   # head-sharded
    (r"lm/layers/\d+/attn/o$", P("model", None)),
    (r"lm/layers/\d+/mlp/(gate|up)$", P(None, "model")),
    (r"lm/layers/\d+/mlp/down$", P("model", None)),
    # scan layout (gemma2.stack_layers_for_scan): same specs shifted one
    # axis right past the leading [num_layers//2] stack dim; "tail" is an
    # unstacked single layer
    (r"lm/layers_scan/[ab]/attn/[qkv]$", P(None, None, "model")),
    (r"lm/layers_scan/[ab]/attn/o$", P(None, "model", None)),
    (r"lm/layers_scan/[ab]/mlp/(gate|up)$", P(None, None, "model")),
    (r"lm/layers_scan/[ab]/mlp/down$", P(None, "model", None)),
    (r"lm/layers_scan/tail/attn/[qkv]$", P(None, "model")),
    (r"lm/layers_scan/tail/attn/o$", P("model", None)),
    (r"lm/layers_scan/tail/mlp/(gate|up)$", P(None, "model")),
    (r"lm/layers_scan/tail/mlp/down$", P("model", None)),
    (r"lm/embedding$", P(None, None)),                   # replicated (tied head)
)


def _spec_for_path(path: str, use_model_axis: bool) -> P:
    if use_model_axis:
        for pattern, spec in _LM_TP_RULES:
            if re.search(pattern, path):
                return spec
    return P()


def param_shardings(mesh: Mesh, params, *, use_model_axis: Optional[bool] = None):
    """Sharding pytree for a full/partial param tree.

    use_model_axis defaults to True iff the mesh's "model" axis size > 1.
    """
    if use_model_axis is None:
        use_model_axis = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1) > 1

    def assign(path_entries, leaf):
        path = "/".join(str(getattr(e, "key", e)) for e in path_entries)
        return NamedSharding(mesh, _spec_for_path(path, use_model_axis))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(mesh: Mesh, params, **kw):
    """device_put the params according to the rules (host -> sharded device)."""
    return jax.device_put(params, param_shardings(mesh, params, **kw))


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch dict, batch-dim sharded over "data"."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return {k: put(v) for k, v in batch.items() if not isinstance(v, list)}
