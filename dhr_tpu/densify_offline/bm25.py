"""BM25 term weighting over a term-frequency store — the Lucene replacement.

The reference shells out to pyserini/Lucene for document term weights
(densify/output_vector.py:15-32: ``IndexReader.compute_bm25_term_weight`` per
term) and for the term dictionary (densify_corpus.py:119-122).  Here both are
plain NumPy over tokenized corpora:

- :class:`TermDictionary`: term -> contiguous id (sorted order), document
  frequencies, collection stats.
- :class:`BM25Vectorizer`: per-doc ``{term_id: weight}`` sparse vectors with
  Lucene-compatible BM25 (k1=0.9, b=0.4 pyserini defaults;
  idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

Terms may be strings (whole-word models: bm25, deepimpact) or wordpiece ids
(unicoil, splade) — ids pass through unchanged.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable


class TermDictionary:
    """Term ids + document frequencies built from a tokenized corpus."""

    def __init__(self):
        self.df: Counter = Counter()
        self.num_docs = 0
        self.total_terms = 0
        self._term2id: dict | None = None

    def add_document(self, terms: Iterable) -> None:
        terms = list(terms)
        self.num_docs += 1
        self.total_terms += len(terms)
        for t in set(terms):
            self.df[t] += 1

    def build(self, reserve: int = 0) -> None:
        """Freeze the dictionary; ids are ``reserve + rank`` in sorted order.

        ``reserve`` mirrors the reference's omission offset: ids below it are
        never assigned, so densification can drop them uniformly.
        """
        self._term2id = {
            t: reserve + i for i, t in enumerate(sorted(map(str, self.df)))
        }

    @property
    def vocab_size(self) -> int:
        assert self._term2id is not None, "call build() first"
        if not self._term2id:
            return 0
        return max(self._term2id.values()) + 1

    def term_id(self, term) -> int | None:
        return self._term2id.get(str(term))

    @property
    def avg_doc_len(self) -> float:
        return self.total_terms / max(self.num_docs, 1)


class BM25Vectorizer:
    """Lucene-flavor BM25 weights: ``idf * tf*(k1+1) / (tf + k1*norm)``."""

    def __init__(self, dictionary: TermDictionary, k1: float = 0.9,
                 b: float = 0.4):
        self.dic = dictionary
        self.k1 = k1
        self.b = b

    def idf(self, term) -> float:
        df = self.dic.df.get(term if not isinstance(term, int) else term, 0)
        if df == 0:
            df = self.dic.df.get(str(term), 0)
        n = self.dic.num_docs
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def doc_vector(self, terms: Iterable) -> dict[int, float]:
        """Sparse ``{term_id: bm25_weight}`` for one document."""
        terms = list(terms)
        tf = Counter(terms)
        dl = len(terms)
        norm = 1.0 - self.b + self.b * dl / max(self.dic.avg_doc_len, 1e-9)
        out = {}
        for term, f in tf.items():
            tid = self.dic.term_id(term)
            if tid is None:
                continue
            w = self.idf(term) * f * (self.k1 + 1.0) / (f + self.k1 * norm)
            out[tid] = w
        return out

    def query_vector(self, terms: Iterable) -> dict[int, float]:
        """Query-side weights = analyzed term frequencies
        (reference densify_query.py:45-52: Lucene-analyzed TF)."""
        tf = Counter(terms)
        out = {}
        for term, f in tf.items():
            tid = self.dic.term_id(term)
            if tid is not None:
                out[tid] = float(f)
        return out


def simple_analyzer(text: str) -> list[str]:
    """Lowercase + alphanumeric word split — a stand-in for Lucene's
    EnglishAnalyzer when raw text (not pre-analyzed terms) is supplied."""
    out, cur = [], []
    for ch in text.lower():
        if ch.isalnum():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out
