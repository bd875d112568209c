"""Offline densification: BM25/impact front ends + streaming densifier."""

from dhr_tpu.densify_offline.bm25 import (
    BM25Vectorizer,
    TermDictionary,
    simple_analyzer,
)
from dhr_tpu.densify_offline.corpus import (
    DensifyConfig,
    densify_batch,
    densify_corpus,
    densify_query_rows,
)
from dhr_tpu.densify_offline.query import (
    bm25_query_vectors,
    encoder_query_vectors,
    whitespace_tf_query_vectors,
)

__all__ = [
    "BM25Vectorizer",
    "DensifyConfig",
    "TermDictionary",
    "bm25_query_vectors",
    "densify_batch",
    "densify_corpus",
    "densify_query_rows",
    "encoder_query_vectors",
    "simple_analyzer",
    "whitespace_tf_query_vectors",
]
