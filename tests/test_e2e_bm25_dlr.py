"""Densified BM25 (DLR) end-to-end — BASELINE.json config #1.

Builds a BM25 term dictionary and sparse vectors from a synthetic corpus,
densifies them into (value, argmax) planes, runs exact GIP retrieval, and
checks the result against the TRUE sparse BM25 dot-product ranking: GIP over
densified vectors must recover the exact sparse scores whenever the query's
important terms don't lose slice collisions, and approximate them closely
otherwise (the DLR premise).
"""

import numpy as np

from dhr_tpu.densify_offline import (
    BM25Vectorizer,
    DensifyConfig,
    TermDictionary,
    bm25_query_vectors,
    densify_corpus,
    densify_query_rows,
)
from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher

WORDS = [f"w{i}" for i in range(120)]


def make_docs(rng, n=80):
    docs = []
    for i in range(n):
        # topical docs: each doc concentrates on a band of the vocabulary
        base = (i * 7) % 100
        words = rng.choice(WORDS[base: base + 20], size=rng.integers(8, 20))
        docs.append(list(words))
    return docs


def test_bm25_dlr_gip_matches_sparse_dot(rng):
    docs = make_docs(rng)
    dic = TermDictionary()
    for d in docs:
        dic.add_document(d)
    omission = DensifyConfig(model="bm25").omission
    dic.build(reserve=omission)
    vec = BM25Vectorizer(dic)

    sparse_docs = [vec.doc_vector(d) for d in docs]
    rows = [(f"d{i}", v) for i, v in enumerate(sparse_docs)]

    cfg = DensifyConfig(model="bm25", out_dim=16)
    vocab = dic.vocab_size
    index = densify_corpus(iter(rows), cfg, vocab)
    assert index.indices.dtype == np.int16

    # queries: word lists drawn from doc topics
    queries = [("q0", " ".join(docs[0][:5])), ("q1", " ".join(docs[33][:5]))]

    def analyzer(text):
        return text.split()

    q_sparse = list(bm25_query_vectors(queries, vec, analyzer))
    qv, qi, qids = densify_query_rows(iter(q_sparse), cfg, vocab)

    searcher = Searcher(
        DeviceIndex.from_packed(index),
        SearchConfig(topk=10, mode="gip", theta=0.0, query_batch=2),
    )
    results, scores = searcher.search_run(qids, qv, qi)

    # oracle: true sparse dot product q . d over the BM25 vectors
    for (qid, q_vec), got_ids, got_scores in (
        (q_sparse[0], results["q0"], scores["q0"]),
        (q_sparse[1], results["q1"], scores["q1"]),
    ):
        true = np.zeros(len(docs))
        for n_, dv in enumerate(sparse_docs):
            true[n_] = sum(w * dv.get(t, 0.0) for t, w in q_vec.items())
        order = np.argsort(-true, kind="stable")
        # GIP scores are a lower bound of sparse scores (collision losses)
        # and equal when no colliding term pair is shared; top-1 must agree
        # on this topical corpus and scores must be close.
        assert got_ids[0] == f"d{order[0]}"
        top_true = true[order[0]]
        assert abs(got_scores[0] - top_true) / (abs(top_true) + 1e-9) < 0.05
        # every GIP score <= its true sparse score (+f16 rounding slack)
        for docid, s in zip(got_ids, got_scores):
            assert s <= true[int(docid[1:])] * 1.01 + 1e-3


def test_bm25_dlr_quantized_cli_pipeline(tmp_path, rng):
    """densify -> index --quantize -> search through the CLI."""
    import json

    from dhr_tpu.cli.main import main
    from dhr_tpu.retrieval import read_run

    vecs = tmp_path / "vectors.jsonl"
    with open(vecs, "w") as f:
        for i in range(24):
            terms = rng.choice(np.arange(472, 520), 6, replace=False)
            f.write(json.dumps({
                "id": f"d{i}",
                "vector": {str(int(t)): float(rng.random() + 0.1)
                           for t in terms},
            }) + "\n")
    shard = str(tmp_path / "s0.npz")
    main(["densify", "--input", str(vecs), "--output", shard,
          "--weight-model", "bm25", "--dim", "8", "--vocab-size", "520"])
    qidx = str(tmp_path / "int8.npz")
    main(["index", "--inputs", str(tmp_path / "s0.npz"), "--output", qidx,
          "--quantize"])
    from dhr_tpu.retrieval import PackedIndex

    packed = PackedIndex.load(qidx)
    assert packed.values.dtype == np.int8
    assert packed.value_scales is not None

    full = PackedIndex.load(shard)
    qnpz = str(tmp_path / "q.npz")
    np.savez(qnpz, values=full.values[:2].astype(np.float32),
             indices=full.indices[:2].astype(np.int32))
    with open(qnpz + ".qids.json", "w") as f:
        json.dump(["q0", "q1"], f)
    run = str(tmp_path / "r.trec")
    main(["search", "--index-path", qidx, "--query-path", qnpz,
          "--output", run, "--brute-force", "--topk", "5",
          "--query-batch", "2"])
    out = read_run(run)
    # self-match survives int8 quantization
    assert list(out["q0"])[0] == "d0"
    assert list(out["q1"])[0] == "d1"
