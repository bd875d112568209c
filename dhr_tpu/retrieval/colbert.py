"""Standalone ColBERT late-interaction scoring over saved token reps.

The reference's ``ColBERTForInference`` (ColBERT/modeling.py:340-442) can
only score inside a live torch process (it is built as the TCT teacher);
there is no offline path from saved reps.  This module closes that gap for
reps produced by :meth:`dhr_tpu.encode.Encoder.encode_tokens`:

- :func:`maxsim_pairwise` — the reference's inference scoring rule
  (ColBERT/modeling.py:187-190): row-aligned token MaxSim
  ``sum_i max_j q_i . p_j`` over non-CLS positions plus the CLS dot product
  (a 1-token MaxSim).  Masked positions hold zero vectors on both sides, so
  they contribute max(..., 0) terms exactly as the reference's
  mask-multiplied reps do.
- :func:`maxsim_listwise` — every query vs every passage (teacher-style
  in-batch scoring, ColBERT/modeling.py:214-219).
- :func:`score_pairs` — id-joined scoring of (qid, pid) candidate pairs,
  batched through one jitted program (offline teacher scores / rerank).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def maxsim_pairwise(q_reps: jax.Array, p_reps: jax.Array) -> jax.Array:
    """Row-aligned scores ``(B,)`` from full reps (CLS at position 0)."""
    q = q_reps.astype(jnp.float32)
    p = p_reps.astype(jnp.float32)
    sim = jnp.einsum("aik,ajk->aij", q[:, 1:], p[:, 1:])
    tok = jnp.sum(jnp.max(sim, axis=-1), axis=-1)
    cls = jnp.sum(q[:, 0] * p[:, 0], axis=-1)
    return tok + cls


@jax.jit
def maxsim_listwise(q_reps: jax.Array, p_reps: jax.Array) -> jax.Array:
    """All-pairs scores ``(B, N)`` from full reps (CLS at position 0)."""
    q = q_reps.astype(jnp.float32)
    p = p_reps.astype(jnp.float32)
    sim = jnp.einsum("aik,bjk->abij", q[:, 1:], p[:, 1:])
    tok = jnp.sum(jnp.max(sim, axis=-1), axis=-1)
    cls = jnp.einsum("ak,bk->ab", q[:, 0], p[:, 0])
    return tok + cls


def score_pairs(
    q_reps: np.ndarray,
    qids: list[str],
    p_reps: np.ndarray,
    pids: list[str],
    pairs: list[tuple[str, str]],
    batch_size: int = 256,
) -> np.ndarray:
    """Scores for explicit (qid, pid) pairs; one jitted maxsim per batch."""
    q_row = {str(q): i for i, q in enumerate(qids)}
    p_row = {str(p): i for i, p in enumerate(pids)}
    qi = np.asarray([q_row[q] for q, _ in pairs], np.int32)
    pi = np.asarray([p_row[p] for _, p in pairs], np.int32)
    out = np.empty(len(pairs), np.float32)
    for start in range(0, len(pairs), batch_size):
        sl = slice(start, min(start + batch_size, len(pairs)))
        n = sl.stop - sl.start
        pad = batch_size - n
        qsel = np.pad(qi[sl], (0, pad))
        psel = np.pad(pi[sl], (0, pad))
        scores = maxsim_pairwise(
            jnp.asarray(q_reps[qsel]), jnp.asarray(p_reps[psel])
        )
        out[sl] = np.asarray(scores)[:n]
    return out
