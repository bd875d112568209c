"""Rerank-style evaluation: score (query, passage, rel) candidate lists.

Replaces the reference's ``driver/eval.py`` (EvalDataset of ~1000 candidates
per query, forward scores, MAP/RPrec/NDCG/MRR/MRR@10 accumulation).  The
reference hard-stops at 200 queries (eval.py:173-174) — a quirk, not copied;
pass ``max_queries`` to reproduce it.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable

import numpy as np

import jax
import jax.numpy as jnp

from dhr_tpu.data.collate import pad_token_batch
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.ops import aggregate, densify, gip_scores_pairwise
from dhr_tpu.train.loss import pairwise_maxsim


def make_pair_scorer(model: BiEncoder, params, cfg: RetrieverConfig,
                     remove_dims: int = 570):
    """Jitted (query_batch, passage_batch) -> per-row fused scores.

    Score semantics per family mirror the inference branches of the reference
    modeling files (DHR/modeling.py:210-227, Aggretriever/modeling.py:222-241,
    ColBERT/modeling.py:187-190, Dense inference dot)."""

    def score(q, p):
        q_reps, p_reps = model.apply(
            {"params": params}, query=q, passage=p, deterministic=True
        )
        if cfg.model_type == "dense":
            return jnp.sum(q_reps.dense * p_reps.dense, axis=-1)
        if cfg.model_type in ("dhr", "dlr"):
            qv, qi = densify(q_reps.lexical, cfg.dlr_out_dim, remove_dims)
            pv, pi = densify(p_reps.lexical, cfg.dlr_out_dim, remove_dims)
            lex = gip_scores_pairwise(qv, qi, pv, pi)
            lam = 1.0 if cfg.combine_cls else 0.0
            sem = jnp.sum(
                q_reps.semantic.astype(jnp.float32)
                * p_reps.semantic.astype(jnp.float32), axis=-1,
            )
            return lex + lam * sem
        if cfg.model_type == "agg":
            q_tok = aggregate(q_reps.lexical, cfg.agg_dim,
                              full=not cfg.semi_aggregate)
            p_tok = aggregate(p_reps.lexical, cfg.agg_dim,
                              full=not cfg.semi_aggregate)
            s = jnp.sum(q_tok * p_tok, axis=-1)
            if q_reps.semantic is not None:
                s = s + jnp.sum(
                    q_reps.semantic.astype(jnp.float32)
                    * p_reps.semantic.astype(jnp.float32), axis=-1,
                )
            return s
        if cfg.model_type == "colbert":
            return pairwise_maxsim(q_reps.token, p_reps.token) + (
                pairwise_maxsim(q_reps.token_cls, p_reps.token_cls)
            )
        raise ValueError(cfg.model_type)

    return jax.jit(score)


def evaluate_rerank(
    scorer,
    examples: Iterable[tuple[str, list[int], str, list[int], int]],
    q_max_len: int = 32,
    p_max_len: int = 128,
    batch_size: int = 64,
    max_queries: int | None = None,
    cls_id: int | None = None,
    sep_id: int | None = None,
    reference_compat: bool = False,
) -> dict:
    """Score (qid, q_tokens, pid, p_tokens, rel) rows, aggregate metrics.

    ``reference_compat=True`` switches NDCG to the reference's exact
    binary-graded formula (``tevatron/utils/metrics.py:36-53``)."""
    from dhr_tpu.eval.metrics import rerank_metrics

    per_query: dict[str, list[tuple[float, int]]] = defaultdict(list)
    buf: list[tuple[str, list[int], list[int], int]] = []
    seen: set[str] = set()

    def flush():
        if not buf:
            return
        n = len(buf)
        pad = batch_size - n
        q = pad_token_batch([b[1] for b in buf] + [[0]] * pad, q_max_len,
                            cls_id=cls_id, sep_id=sep_id)
        p = pad_token_batch([b[2] for b in buf] + [[0]] * pad, p_max_len,
                            cls_id=cls_id, sep_id=sep_id)
        scores = np.asarray(
            scorer(jax.tree.map(jnp.asarray, q), jax.tree.map(jnp.asarray, p))
        )[:n]
        for (qid, _, _, rel), s in zip(buf, scores):
            per_query[qid].append((float(s), int(rel)))
        buf.clear()

    for qid, q_tokens, _pid, p_tokens, rel in examples:
        # Count queries as their rows are READ (not as they are flushed) so
        # the cut never lands mid-query: a new qid past the cap stops the
        # loop before any of its rows are buffered.
        if max_queries is not None and qid not in seen and (
            len(seen) >= max_queries
        ):
            break
        seen.add(qid)
        buf.append((qid, q_tokens, p_tokens or [0], rel))
        if len(buf) == batch_size:
            flush()
    flush()

    ranked = []
    for qid, rows in per_query.items():
        rows.sort(key=lambda x: -x[0])
        ranked.append(np.asarray([rel for _, rel in rows]))
    out = rerank_metrics(ranked, reference_compat=reference_compat)
    out["num_queries"] = len(ranked)
    return out
