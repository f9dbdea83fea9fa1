"""Mesh + sharding rules for multi-chip execution.

The reference is strictly single-GPU (SURVEY.md §2.6: no torch.distributed,
no NCCL); the TPU design scales two ways:

* **data parallel**: slices of a volume / episodes of a training batch are
  sharded over the 'data' mesh axis — the z-stack is embarrassingly parallel
  (reference processes it sequentially, validation.py:227-309);
* **tensor parallel**: ViT attention heads and MLP hidden dims shard over
  'model' (Megatron-style column/row split) for the big encoders — XLA
  inserts the all-reduces over ICI from the shardings alone.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Megatron split for transformer params inside any of our encoders:
#   qkv / mlp-up kernels: column-parallel (shard output dim)
#   proj / mlp-down kernels: row-parallel (shard input dim)
_COL = frozenset({"qkv", "mlp_fc1", "lin1", "q_proj", "k_proj", "v_proj"})
_ROW = frozenset({"proj", "mlp_fc2", "lin2", "out_proj"})


def encoder_param_sharding(params: Any, mesh: Mesh) -> Any:
    """PartitionSpecs for a model param tree: TP for transformer kernels,
    replicated elsewhere."""

    def spec_for(path, leaf) -> P:
        names = [p.key for p in path if hasattr(p, "key")]
        parent = names[-2] if len(names) >= 2 else ""
        leafname = names[-1] if names else ""
        if leafname == "kernel" and leaf.ndim in (2, 3):
            # 3-D kernels are nn.scan-stacked: (layers, in, out)
            lead = (None,) * (leaf.ndim - 2)
            if parent in _COL:
                return P(*lead, None, "model")
            if parent in _ROW:
                return P(*lead, "model", None)
        if leafname == "bias" and parent in _COL:
            lead = (None,) * (leaf.ndim - 1)
            return P(*lead, "model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every leaf over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
