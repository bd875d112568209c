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


@functools.partial(jax.jit, static_argnames=("topk", "p_chunk"))
def _maxsim_topk_device(
    q_reps: jax.Array, p_reps: jax.Array, valid: jax.Array,
    topk: int, p_chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """One query batch vs the FULL passage plane, streamed in chunks.

    ``lax.scan`` over ``p_chunk``-passage slabs keeps exactly one
    ``(B, p_chunk, Lq, Lp)`` similarity block live at a time (the whole
    ``(B, N)`` score plane never materializes), maintaining a running
    exact top-``topk`` per query via concatenate + ``lax.top_k`` — the
    same streaming-reduce shape as the GIP searcher's candidate merge.
    Pad passages carry ``valid=False`` and score ``-inf``.
    """
    b = q_reps.shape[0]
    n_chunks = p_reps.shape[0] // p_chunk
    p = p_reps.reshape(n_chunks, p_chunk, *p_reps.shape[1:])
    v = valid.reshape(n_chunks, p_chunk)
    init = (
        jnp.full((b, topk), -jnp.inf, jnp.float32),
        jnp.zeros((b, topk), jnp.int32),
    )

    def body(carry, xs):
        best_s, best_i = carry
        pc, vc, c = xs
        s = maxsim_listwise(q_reps, pc)  # (B, p_chunk)
        s = jnp.where(vc[None, :], s, -jnp.inf)
        ids = c * p_chunk + jnp.arange(p_chunk, dtype=jnp.int32)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids[None, :], (b, p_chunk))], axis=1)
        ns, pos = jax.lax.top_k(cat_s, topk)
        return (ns, jnp.take_along_axis(cat_i, pos, axis=1)), None

    (scores, rows), _ = jax.lax.scan(
        body, init, (p, v, jnp.arange(n_chunks, dtype=jnp.int32)))
    return scores, rows


def full_ranking(
    q_reps: np.ndarray,
    p_reps: np.ndarray,
    topk: int = 1000,
    q_batch: int = 16,
    p_chunk: int = 512,
    max_plane_bytes: int = 4 << 30,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact end-to-end MaxSim retrieval: every query vs every passage.

    Goes beyond the reference, which has NO first-stage ColBERT retrieval
    path at all (ColBERT/modeling.py:340-442 scores candidate pairs only,
    as the TCT teacher / reranker); this closes the loop so a ColBERT
    model trains and retrieves through the same verbs as the other
    families.

    When the token-rep plane fits ``max_plane_bytes`` it uploads once and
    query batches stream through one compiled scan program.  A larger
    plane (the token plane is ``N x L x D`` — ~3.3 GB at 102.4k passages
    f16, far over HBM at 1M) is instead streamed host->device in
    passage *slabs*: each slab is exact-top-k'd on device and the
    per-slab results merge exactly on the host, so corpus scale is
    bounded by host memory, not HBM.

    Returns ``(scores (Nq, topk), rows (Nq, topk))`` with rows as
    passage-plane positions (exact, descending score).
    """
    n = p_reps.shape[0]
    topk = min(topk, n)
    if p_reps.nbytes > max_plane_bytes and n > p_chunk:
        per_row = max(1, p_reps.nbytes // n)
        slab = max(p_chunk,
                   (max_plane_bytes // per_row) // p_chunk * p_chunk)
        parts_s, parts_r = [], []
        for s0 in range(0, n, slab):
            sub = p_reps[s0: s0 + slab]
            ss, rr = full_ranking(
                q_reps, sub, topk=min(topk, sub.shape[0]),
                q_batch=q_batch, p_chunk=p_chunk,
                max_plane_bytes=max_plane_bytes,
            )
            parts_s.append(ss)
            parts_r.append(rr + s0)
        cat_s = np.concatenate(parts_s, axis=1)
        cat_r = np.concatenate(parts_r, axis=1)
        order = np.argsort(-cat_s, axis=1, kind="stable")[:, :topk]
        return (np.take_along_axis(cat_s, order, axis=1),
                np.take_along_axis(cat_r, order, axis=1))
    p_chunk = min(p_chunk, n)
    pad_p = (-n) % p_chunk
    valid = np.ones(n + pad_p, bool)
    if pad_p:
        p_reps = np.pad(p_reps, ((0, pad_p), (0, 0), (0, 0)))
        valid[n:] = False
    p_d = jnp.asarray(p_reps)
    v_d = jnp.asarray(valid)
    nq = q_reps.shape[0]
    scores = np.empty((nq, topk), np.float32)
    rows = np.empty((nq, topk), np.int64)
    for start in range(0, nq, q_batch):
        sl = slice(start, min(start + q_batch, nq))
        nb = sl.stop - sl.start
        qb = np.pad(q_reps[sl], ((0, q_batch - nb), (0, 0), (0, 0)))
        s, r = _maxsim_topk_device(jnp.asarray(qb), p_d, v_d, topk, p_chunk)
        scores[sl] = np.asarray(s)[:nb]
        rows[sl] = np.asarray(r)[:nb]
    return scores, rows
