"""Evaluation: ranking metrics and harnesses."""

from dhr_tpu.eval.metrics import (
    average_precision,
    evaluate_run,
    hole_at_k,
    mrr_at_k,
    ndcg_at_k,
    ndcg_from_ranked,
    ndcg_reference,
    r_precision,
    recall_at_k,
    recall_cap_at_k,
    zero_positive_queries,
    reciprocal_rank,
    rerank_metrics,
    top_k_accuracy,
)

__all__ = [
    "average_precision",
    "evaluate_run",
    "hole_at_k",
    "mrr_at_k",
    "ndcg_at_k",
    "ndcg_from_ranked",
    "ndcg_reference",
    "r_precision",
    "recall_at_k",
    "recall_cap_at_k",
    "zero_positive_queries",
    "reciprocal_rank",
    "rerank_metrics",
    "top_k_accuracy",
]
