import math

import numpy as np

from dhr_tpu.densify_offline import (
    BM25Vectorizer,
    DensifyConfig,
    TermDictionary,
    bm25_query_vectors,
    densify_batch,
    densify_corpus,
    densify_query_rows,
    simple_analyzer,
    whitespace_tf_query_vectors,
)
from dhr_tpu.ops import densify_sparse_rows


def build_dictionary(docs, reserve=0):
    d = TermDictionary()
    for doc in docs:
        d.add_document(doc)
    d.build(reserve=reserve)
    return d


def test_term_dictionary_ids_and_df():
    docs = [["b", "a", "b"], ["a", "c"]]
    d = build_dictionary(docs, reserve=5)
    assert d.num_docs == 2
    assert d.term_id("a") == 5  # sorted order after reserve
    assert d.term_id("b") == 6
    assert d.df["a"] == 2 and d.df["b"] == 1
    assert d.avg_doc_len == 2.5


def test_bm25_weight_formula():
    docs = [["x", "y"], ["x"], ["z", "z", "z"]]
    d = build_dictionary(docs)
    v = BM25Vectorizer(d, k1=0.9, b=0.4)
    vec = v.doc_vector(["z", "z", "z"])
    tid = d.term_id("z")
    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    norm = 1 - 0.4 + 0.4 * 3 / 2.0  # dl=3, avgdl=2
    want = idf * 3 * 1.9 / (3 + 0.9 * norm)
    assert abs(vec[tid] - want) < 1e-9


def test_bm25_query_vector_is_tf():
    d = build_dictionary([["hello", "world"]])
    v = BM25Vectorizer(d)
    (qid, vec), = list(bm25_query_vectors([("q1", "hello hello unseen")], v))
    assert vec == {d.term_id("hello"): 2.0}


def test_whitespace_tf_query():
    d = build_dictionary([["a", "b"]])
    (qid, vec), = list(
        whitespace_tf_query_vectors([("q", "a a b c")], d.term_id)
    )
    assert vec[d.term_id("a")] == 2.0
    assert vec[d.term_id("b")] == 1.0


def test_densify_batch_matches_scalar_twin():
    cfg = DensifyConfig(model="unicoil", out_dim=8)
    vocab = cfg.padded_vocab(600)  # 570 + 8k
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(5):
        ids = rng.choice(np.arange(570, vocab), size=12, replace=False)
        rows.append({int(t): float(rng.random() + 0.01) for t in ids})
    vals, idxs, _ = densify_batch(rows, cfg, vocab)
    assert idxs.dtype == np.uint8
    for i, row in enumerate(rows):
        v, ix, _ = densify_sparse_rows(
            list(row.keys()), list(row.values()), 8, 570, vocab
        )
        np.testing.assert_allclose(vals[i].astype(np.float32), v.astype(np.float16).astype(np.float32))
        occupied = v > 0
        np.testing.assert_array_equal(idxs[i][occupied], ix[occupied])


def test_densify_corpus_stream_and_dtypes():
    cfg = DensifyConfig(model="bm25", out_dim=4)
    vocab = cfg.padded_vocab(500)
    rows = [(f"d{i}", {472 + i: 1.0 + i}) for i in range(10)]
    index = densify_corpus(iter(rows), cfg, 500, batch_size=3)
    assert index.num_rows == 10
    assert index.indices.dtype == np.int16  # whole-word model
    assert index.values.dtype == np.float16
    assert list(index.docids[:2]) == ["d0", "d1"]
    # row 0: token 472 -> slice 0, fold 0, weight 1.0
    assert index.values[0, 0] == 1.0
    assert index.indices[0, 0] == 0


def test_densify_query_rows_always_i16():
    cfg = DensifyConfig(model="unicoil", out_dim=8)
    vocab = cfg.padded_vocab(600)
    qv, qi, qids = densify_query_rows(
        [("q0", {571: 2.0})], cfg, 600, batch_size=2
    )
    assert qi.dtype == np.int16
    assert qids == ["q0"]
    assert qv[0, 1] == 2.0  # token 571 - 570 = offset 1 -> slice 1


def test_simple_analyzer():
    assert simple_analyzer("Hello, World! 42x") == ["hello", "world", "42x"]


def test_padded_vocab_divisibility():
    cfg = DensifyConfig(model="splade", out_dim=768)
    assert (cfg.padded_vocab(30522) - 570) % 768 == 0
    assert cfg.padded_vocab(30522) == 30522  # 29952 = 39*768 exactly


def test_unicoil_query_encoder(rng):
    import jax
    import jax.numpy as jnp

    from dhr_tpu.densify_offline.query import (
        encoder_query_vectors,
        make_unicoil_query_encoder,
    )
    from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
    from dhr_tpu.models.transformer import EncoderConfig

    cfg = RetrieverConfig(
        model_type="agg", skip_mlm=True,
        encoder=EncoderConfig.tiny(vocab_size=70, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        agg_dim=8,
    )
    model = BiEncoder(cfg)
    dummy = {"input_ids": jnp.zeros((1, 4), jnp.int32),
             "attention_mask": jnp.ones((1, 4), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), query=dummy)["params"]

    class Tok:
        def encode(self, text, add_special_tokens=False, max_length=None,
                   truncation=True):
            return [(hash(w) % 60) + 5 for w in text.split()][:max_length]

    enc = make_unicoil_query_encoder(model, params, Tok(), cls_id=1)
    vec = enc("hello world hello")
    assert isinstance(vec, dict)
    assert all(isinstance(k, int) and v > 0 for k, v in vec.items())
    rows = list(encoder_query_vectors([("q0", "hello world")], enc))
    assert rows[0][0] == "q0"
