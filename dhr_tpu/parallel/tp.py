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


# --------------------------------------------------------------------------
# FSDP/ZeRO-style weight sharding (also absent from the reference)
# --------------------------------------------------------------------------


def fsdp_param_specs(params, axis: str = "data", min_size: int = 2 ** 14):
    """Shard every large param's first divisible dim over ``axis``.

    ZeRO-3-flavored: weights (and, via optax init inheriting shardings,
    optimizer moments) live sharded over the data axis; XLA all-gathers each
    weight where it is used and reduce-scatters its gradient.  Small params
    (norms, biases) stay replicated.
    """
    import numpy as np

    def spec(path, leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return P()
        return P(axis, *([None] * (len(shape) - 1)))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "data",
                      min_size: int = 2 ** 14):
    """Device-put params with FSDP sharding; dims not divisible by the axis
    size fall back to replication."""
    n = mesh.shape[axis]

    def put(x, s):
        if s != P() and x.shape[0] % n != 0:
            s = P()
        return jax.device_put(x, NamedSharding(mesh, s))

    specs = fsdp_param_specs(params, axis, min_size)
    return jax.tree.map(put, params, specs)
