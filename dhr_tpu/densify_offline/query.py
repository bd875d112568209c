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


def make_unicoil_query_encoder(model, params, tokenizer, max_len: int = 64,
                               cls_id: int | None = 101):
    """Build a uniCOIL-style query encoder callable from a dhr_tpu model.

    uniCOIL assigns each query token a learned scalar weight at its own vocab
    position — exactly the skip-MLM lexical rep of the Aggretriever family
    (scatter-max of TermWeightTrans outputs at the input token ids, reference
    Aggretriever/modeling.py:296-316).  Any ``agg``-family model trained with
    ``skip_mlm=True`` works; the returned callable maps text ->
    ``{token_id: weight}`` and plugs into :func:`encoder_query_vectors`
    (replacing pyserini's ``UniCoilQueryEncoder``, reference
    densify_query.py:15,58-69).
    """
    import jax.numpy as jnp

    def encode(text: str) -> dict:
        ids = tokenizer.encode(
            text, add_special_tokens=False, max_length=max_len, truncation=True
        ) or [0]
        if cls_id is not None:
            ids = [cls_id] + ids
        batch = {
            "input_ids": jnp.asarray([ids], jnp.int32),
            "attention_mask": jnp.ones((1, len(ids)), jnp.int32),
        }
        q_reps, _ = model.apply({"params": params}, query=batch,
                                deterministic=True)
        lex = q_reps.lexical[0]
        import numpy as np

        lex_np = np.asarray(lex)
        out = {}
        for t in set(ids[1:] if cls_id is not None else ids):
            w = float(lex_np[t])
            if w > 0:
                out[int(t)] = w
        return out

    return encode


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
