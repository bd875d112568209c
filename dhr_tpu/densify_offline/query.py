"""Query-side sparse vector construction (reference densify/densify_query.py).

Per front end:
- bm25: analyzed term frequencies over the corpus term dictionary
  (densify_query.py:45-52)
- deepimpact: whitespace term frequencies (densify_query.py:53-57)
- unicoil / splade: weights from a query encoder callable
  (densify_query.py:58-69; the reference uses pyserini's
  ``UniCoilQueryEncoder`` — any ``encode(text) -> {token: weight}`` works)
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Iterator

from dhr_tpu.densify_offline.bm25 import BM25Vectorizer, simple_analyzer


def bm25_query_vectors(
    queries: list[tuple[str, str]],
    vectorizer: BM25Vectorizer,
    analyzer: Callable[[str], list[str]] = simple_analyzer,
) -> Iterator[tuple[str, dict]]:
    for qid, text in queries:
        yield qid, vectorizer.query_vector(analyzer(text))


def whitespace_tf_query_vectors(
    queries: list[tuple[str, str]],
    term_id: Callable[[str], int | None],
) -> Iterator[tuple[str, dict]]:
    """DeepImpact-style: raw whitespace term frequency."""
    for qid, text in queries:
        tf = Counter(text.split())
        vec = {}
        for term, f in tf.items():
            tid = term_id(term)
            if tid is not None:
                vec[tid] = float(f)
        yield qid, vec


def encoder_query_vectors(
    queries: list[tuple[str, str]],
    encoder: Callable[[str], dict],
    token_to_id: Callable[[str], int | None] | None = None,
) -> Iterator[tuple[str, dict]]:
    """uniCOIL/SPLADE-style: weights from a learned query encoder."""
    for qid, text in queries:
        raw = encoder(text)
        if token_to_id is None:
            yield qid, {int(t): float(w) for t, w in raw.items()}
        else:
            vec = {}
            for tok, w in raw.items():
                tid = token_to_id(tok)
                if tid is not None:
                    vec[tid] = float(w)
            yield qid, vec
