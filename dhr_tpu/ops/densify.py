"""Densification: vocabulary-space lexical vectors -> (value, argmax-index) pairs.

This is the core "DLR" op of the framework.  A lexical representation lives in
vocabulary space (|V| ~ 30522 for wordpiece models).  Densification drops the
first ``remove_dims`` vocabulary slots (special/unused tokens), reshapes the
remainder row-major into ``(k, out_dim)`` and max-pools over the fold axis,
remembering which fold won:

    token offset u = t - remove_dims  ->  slice  u %  out_dim
                                          fold   u // out_dim
    values[j]  = max_i  x[i, j]
    indices[j] = argmax_i x[i, j]          (first maximum wins on ties)

Semantics parity: reference ``tevatron/DHR/utils.py:5-22`` (model side) and
``densify/densify_corpus.py:29-52`` (offline side) — both are exactly this
fold-max; here one jitted op serves both paths.  Ties resolve to the first
(lowest fold) maximum, matching ``torch.Tensor.max`` and ``np.argmax``.

The op is differentiable in ``values`` (gradient routes to the argmax slot,
identical to autograd through ``torch.max``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Default vocabulary omission for BERT/DistilBERT wordpiece models: the first
# 570 ids are special tokens / unused slots.  30522 - 570 = 29952 = 39 * 768.
WORDPIECE_REMOVE_DIMS = 570
# Per-front-end omission counts (reference densify/densify_corpus.py:17-21).
REMOVE_DIMS_BY_MODEL = {
    "bm25": 472,
    "deepimpact": 502,
    "unicoil": 570,
    "splade": 570,
    "dhr": 570,
    "dlr": 570,
}


def densify(
    lexical_reps: jax.Array,
    out_dim: int = 768,
    remove_dims: int = WORDPIECE_REMOVE_DIMS,
) -> tuple[jax.Array, jax.Array]:
    """Densify a batch of vocabulary-space vectors.

    Args:
      lexical_reps: ``(..., vocab)`` float array.
      out_dim: densified dimensionality ``d``.
      remove_dims: number of leading vocabulary slots to drop; ``vocab -
        remove_dims`` must be divisible by ``out_dim``.

    Returns:
      ``(values, indices)`` with shapes ``(..., out_dim)``; ``values`` keeps
      the input dtype, ``indices`` is int32 in ``[0, k)`` where
      ``k = (vocab - remove_dims) // out_dim``.
    """
    vocab = lexical_reps.shape[-1]
    if (vocab - remove_dims) % out_dim != 0:
        raise ValueError(
            f"vocab - remove_dims = {vocab - remove_dims} not divisible by "
            f"out_dim = {out_dim}"
        )
    k = (vocab - remove_dims) // out_dim
    lead = lexical_reps.shape[:-1]
    folded = lexical_reps[..., remove_dims:].reshape(*lead, k, out_dim)
    values = jnp.max(folded, axis=-2)
    indices = jnp.argmax(folded, axis=-2).astype(jnp.int32)
    return values, indices


def undensify(
    values: jax.Array,
    indices: jax.Array,
    vocab_size: int,
    remove_dims: int = WORDPIECE_REMOVE_DIMS,
) -> jax.Array:
    """Scatter a densified pair back to a (lossy) vocabulary-space vector.

    Only the argmax survivor of each fold is recovered; colliding tokens that
    lost the max are zero.  Used for diagnostics and round-trip tests.
    """
    out_dim = values.shape[-1]
    k = (vocab_size - remove_dims) // out_dim
    lead = values.shape[:-1]
    folded = jnp.zeros((*lead, k, out_dim), dtype=values.dtype)
    idx = indices[..., None, :].astype(jnp.int32)
    folded = jnp.put_along_axis(
        folded, idx, values[..., None, :], axis=-2, inplace=False
    )
    flat = folded.reshape(*lead, k * out_dim)
    pad = [(0, 0)] * (flat.ndim - 1) + [(remove_dims, 0)]
    return jnp.pad(flat, pad)


def densify_sparse_rows(
    token_ids,
    weights,
    out_dim: int,
    remove_dims: int,
    vocab_size: int,
):
    """Densify ragged sparse rows given as (token_ids, weights) pairs.

    Host-side twin of :func:`densify` for the offline pipeline where inputs
    arrive as sparse ``{token: weight}`` maps rather than dense vocab vectors
    (reference densify/densify_corpus.py:36-51).  Implemented with NumPy for
    streaming corpora; see ``dhr_tpu.densify_offline`` for the batch driver.

    Args:
      token_ids: int array of token ids for one document.
      weights: float array of matching weights.
      out_dim / remove_dims / vocab_size: as in :func:`densify`.

    Returns:
      ``(values, indices, n_collisions)`` NumPy arrays of shape
      ``(out_dim,)`` and the collision count.
    """
    import numpy as np

    k = (vocab_size - remove_dims) // out_dim
    values = np.zeros((out_dim,), dtype=np.float32)
    indices = np.zeros((out_dim,), dtype=np.int32)
    occupied = np.zeros((out_dim,), dtype=bool)
    token_ids = np.asarray(token_ids)
    weights = np.asarray(weights)
    keep = token_ids >= remove_dims
    token_ids = token_ids[keep]
    weights = weights[keep]
    u = token_ids - remove_dims
    slices = u % out_dim
    folds = u // out_dim
    # collisions = extra tokens beyond the first landing on each slice
    collisions = len(slices) - len(np.unique(slices)) if len(slices) else 0
    # Max-collision resolution with first-fold tie break: process in fold
    # order so the first (lowest-fold) maximum wins, matching densify().
    order = np.argsort(folds, kind="stable")
    for j in order:
        s, f, w = slices[j], folds[j], weights[j]
        if not occupied[s] or w > values[s]:
            values[s] = w
            indices[s] = f
            occupied[s] = True
    assert folds.max(initial=0) < k
    return values, indices, collisions
