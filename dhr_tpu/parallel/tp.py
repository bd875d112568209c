"""Tensor-parallel parameter sharding rules (Megatron-style, XLA-inserted).

The reference has no tensor parallelism (SURVEY.md 2.10 — its encoders are
66M params and DP suffices).  dhr_tpu goes further: for larger encoder
configs, params can be sharded over a ``model`` mesh axis with the standard
column/row-parallel pattern, and the train/encode steps need NO code changes
— the steps are already ``jit``-compiled with sharded inputs, so annotating
the parameter shardings makes XLA insert the TP collectives (all-reduce after
the attention output and FFN down-projection), per the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives.

Rules over the BiEncoder param tree (see models/transformer.py):

- attention query/key/value kernels  (H, heads, head_dim)  -> shard ``heads``
- attention out kernel               (heads, head_dim, H)  -> shard ``heads``
  (row-parallel: XLA all-reduces the output)
- ffn_in kernel                      (H, intermediate)     -> shard columns
- ffn_out kernel                     (intermediate, H)     -> shard rows
- matching biases shard with their output dim where sharded
- embeddings, layer norms, poolers, MLM transform: replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def _spec_for(path: tuple, leaf, axis: str) -> P:
    keys = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(keys)
    ndim = getattr(leaf, "ndim", 0)
    if "attention" in joined:
        if keys[-2] in ("query", "key", "value"):
            if keys[-1] == "kernel" and ndim == 3:   # (H, heads, hd)
                return P(None, axis, None)
            if keys[-1] == "bias" and ndim == 2:     # (heads, hd)
                return P(axis, None)
        if keys[-2] == "out":
            if keys[-1] == "kernel" and ndim == 3:   # (heads, hd, H)
                return P(axis, None, None)
            return P()                                # output bias replicated
    if keys[-2] == "ffn_in":
        if keys[-1] == "kernel" and ndim == 2:       # (H, I)
            return P(None, axis)
        if keys[-1] == "bias":
            return P(axis)
    if keys[-2] == "ffn_out":
        if keys[-1] == "kernel" and ndim == 2:       # (I, H)
            return P(axis, None)
        return P()
    return P()


def tp_param_specs(params, axis: str = MODEL_AXIS):
    """PartitionSpec tree for a BiEncoder param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, axis), params
    )


def shard_params_tp(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Device-put params with the TP sharding rules over ``mesh``."""
    specs = tp_param_specs(params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
