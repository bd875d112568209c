"""Aggretriever aggregation: fold a vocab-space vector to a fixed dim.

Two modes (semantics parity: reference ``tevatron/Aggretriever/utils.py:8-44``):

- ``full`` (default): fold the vocabulary into ``(k, 2*dim)`` (front-trimming
  or zero-padding the tail so it divides evenly), max-pool over folds, then run
  a *sign competition* between the interleaved halves: even lanes are the
  "positive" candidates, odd lanes the "negative" candidates, and each output
  lane keeps ``pos`` if ``pos > neg`` else ``-neg``.
- ``semi``: plain fold-max to ``(k, dim)`` — identical to the densify op's
  value plane.

Trim rule: ``r = vocab % fold_width``; if ``r > 1000`` the fold is instead
padded with ``fold_width - r`` zeros at the *end* (the first ~1000 BERT ids are
special/unused, so trimming more than that would discard real tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cal_remove_dim(dims: int, vocab_size: int = 30522) -> int:
    """Leading dims to trim (or, if negative, trailing zeros to pad)."""
    remove_dims = vocab_size % dims
    if remove_dims > 1000:
        remove_dims -= dims
    return remove_dims


def aggregate(
    lexical_reps: jax.Array,
    dim: int = 640,
    full: bool = True,
) -> jax.Array:
    """Aggregate ``(..., vocab)`` lexical vectors to ``(..., dim)``."""
    vocab = lexical_reps.shape[-1]
    lead = lexical_reps.shape[:-1]
    if full:
        width = 2 * dim
        remove_dims = cal_remove_dim(width, vocab)
        if remove_dims >= 0:
            x = lexical_reps[..., remove_dims:]
        else:
            pad = [(0, 0)] * (lexical_reps.ndim - 1) + [(0, -remove_dims)]
            x = jnp.pad(lexical_reps, pad)
        folded = x.reshape(*lead, -1, width)
        tok = jnp.max(folded, axis=-2)
        pos = tok[..., 0::2]
        neg = tok[..., 1::2]
        win = pos > neg
        return jnp.where(win, pos, -neg)
    else:
        remove_dims = cal_remove_dim(dim, vocab)
        if remove_dims >= 0:
            x = lexical_reps[..., remove_dims:]
        else:
            pad = [(0, 0)] * (lexical_reps.ndim - 1) + [(0, -remove_dims)]
            x = jnp.pad(lexical_reps, pad)
        folded = x.reshape(*lead, -1, dim)
        return jnp.max(folded, axis=-2)


def merge_reps(lexical_reps: jax.Array, semantic_reps: jax.Array) -> jax.Array:
    """Concatenate aggregated lexical and semantic planes into one vector.

    Parity: reference ``tevatron/Aggretriever/modeling.py:327-333``.
    """
    return jnp.concatenate(
        [lexical_reps, semantic_reps.astype(lexical_reps.dtype)], axis=-1
    )
