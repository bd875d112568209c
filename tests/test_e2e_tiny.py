"""Minimum end-to-end slice (SURVEY.md section 7): encode -> index -> search
-> TREC -> metrics, on a tiny random DHR model and synthetic corpus, checked
against an exact NumPy retrieval oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from dhr_tpu.encode import EncodeConfig, Encoder, iter_batches
from dhr_tpu.eval import evaluate_run, mrr_at_k
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig
from dhr_tpu.retrieval import (
    DeviceIndex,
    PackedIndex,
    SearchConfig,
    Searcher,
    read_run,
    write_run,
)

VOCAB = 70
REMOVE = 6
DLR_DIM = 8


def build_model(model_type="dhr"):
    cfg = RetrieverConfig(
        model_type=model_type,
        encoder=EncoderConfig.tiny(vocab_size=VOCAB, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        add_pooler=True,
        projection_dim=4,
        dlr_out_dim=DLR_DIM,
        agg_dim=8,
    )
    model = BiEncoder(cfg)
    dummy = {
        "input_ids": jnp.zeros((2, 6), jnp.int32),
        "attention_mask": jnp.ones((2, 6), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), query=dummy, passage=dummy)[
        "params"
    ]
    return model, params, cfg


def make_texts(rng, n, L):
    ids = rng.integers(1, VOCAB, (n, L)).astype(np.int32)
    mask = np.ones((n, L), np.int32)
    return ids, mask


def test_e2e_dhr_gip_pipeline(rng, tmp_path):
    model, params, cfg = build_model("dhr")
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=16,
                                                   remove_dims=REMOVE))

    # corpus: 96 passages; queries: 8 (each a corrupted copy of passage 3*i,
    # so ground truth relevance is docid d_{3i})
    c_ids, c_mask = make_texts(rng, 96, 12)
    q_ids = c_ids[::12][:8].copy()  # exact copies of passages d0, d12, ...
    q_mask = np.ones_like(q_ids)

    docids = [f"d{i}" for i in range(96)]
    packed = enc.encode_corpus(
        iter_batches(docids, c_ids, c_mask, batch_size=16)
    )
    assert packed.values.shape == (96, DLR_DIM + 4)
    assert packed.indices.shape == (96, DLR_DIM)
    assert packed.values.dtype == np.float16
    assert packed.indices.dtype == np.uint8

    qv, qi, qids = enc.encode_queries(
        iter_batches([f"q{i}" for i in range(8)], q_ids, q_mask, batch_size=16)
    )

    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=10, mode="gip", theta=0.0, query_batch=8),
    )
    results, scores = searcher.search_run(qids, qv, qi)

    # exact oracle on the device's view of the planes (bf16-rounded values)
    dev_values = np.asarray(
        jnp.asarray(packed.values, jnp.bfloat16).astype(jnp.float32)
    )

    def oracle_rank(b):
        lex = packed.lex_dim
        s = np.zeros(96)
        for n in range(96):
            gate = packed.indices[n] == qi[b, :lex]
            s[n] = np.sum(
                np.where(gate, qv[b, :lex] * dev_values[n, :lex].astype(np.float64), 0)
            ) + np.sum(qv[b, lex:] * dev_values[n, lex:].astype(np.float64))
        return [f"d{i}" for i in np.argsort(-s, kind="stable")[:10]]

    for b in range(8):
        assert results[f"q{b}"] == oracle_rank(b), f"query {b}"

    # TREC roundtrip + metrics plumbing: qrels built from the oracle's own
    # top-1 must give MRR@10 == 1.0 through the full write/read/metric path.
    # (GIP is an unnormalized inner product: an untrained random model need
    # not rank a query's identical passage first, so self-qrels would only
    # test the model, not the pipeline.)
    run_path = str(tmp_path / "run.trec")
    write_run(run_path, results, scores)
    run = read_run(run_path)
    qrels = {f"q{i}": {oracle_rank(i)[0]: 1} for i in range(8)}
    assert abs(mrr_at_k(qrels, run, 10) - 1.0) < 1e-9
    bundle = evaluate_run(qrels, run, k_values=(10,))
    assert abs(bundle["Recall@10"] - 1.0) < 1e-9


def test_e2e_agg_ip_pipeline(rng):
    model, params, cfg = build_model("agg")
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=16,
                                                   remove_dims=REMOVE))
    c_ids, c_mask = make_texts(rng, 40, 10)
    docids = [f"d{i}" for i in range(40)]
    packed = enc.encode_corpus(iter_batches(docids, c_ids, c_mask, 16))
    assert packed.values.shape == (40, 8 + 4)  # agg_dim + projection_dim
    assert packed.indices is None

    qv, qi, qids = enc.encode_queries(
        iter_batches(["q0", "q1"], c_ids[:2], c_mask[:2], 16)
    )
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=5, mode="ip", query_batch=2),
    )
    results, _ = searcher.search_run(qids, qv, qi)
    # searcher top-1 must equal the IP oracle's top-1
    want = qv.astype(np.float64) @ np.asarray(
        jnp.asarray(packed.values, jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float64).T
    for b, qid in enumerate(["q0", "q1"]):
        assert results[qid][0] == f"d{np.argmax(want[b])}"


def test_e2e_dense_pipeline(rng):
    model, params, cfg = build_model("dense")
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=8))
    c_ids, c_mask = make_texts(rng, 24, 10)
    packed = enc.encode_corpus(
        iter_batches([f"d{i}" for i in range(24)], c_ids, c_mask, 8)
    )
    assert packed.indices is None
    qv, _, qids = enc.encode_queries(
        iter_batches(["q0"], c_ids[:1], c_mask[:1], 8)
    )
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=3, mode="ip", query_batch=1),
    )
    results, _ = searcher.search_run(qids, qv)
    want = qv.astype(np.float64) @ np.asarray(
        jnp.asarray(packed.values, jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float64).T
    assert results["q0"][0] == f"d{np.argmax(want[0])}"


def test_mesh_sharded_encode_matches_single_device(rng, eight_devices):
    from dhr_tpu.parallel import make_mesh

    model, params, cfg = build_model("dhr")
    c_ids, c_mask = make_texts(rng, 32, 10)
    docids = [f"d{i}" for i in range(32)]

    enc1 = Encoder(model, params, cfg,
                   EncodeConfig(batch_size=16, remove_dims=REMOVE))
    p1 = enc1.encode_corpus(iter_batches(docids, c_ids, c_mask, 16))

    mesh = make_mesh(eight_devices, axis="data")
    enc8 = Encoder(model, params, cfg,
                   EncodeConfig(batch_size=16, remove_dims=REMOVE), mesh=mesh)
    p8 = enc8.encode_corpus(iter_batches(docids, c_ids, c_mask, 16))

    np.testing.assert_array_equal(p1.values, p8.values)
    np.testing.assert_array_equal(p1.indices, p8.indices)


def test_e2e_agg_semi_and_skip_mlm_variants(rng):
    """Aggretriever flag combinations (--semi-aggregate, --skip-mlm) e2e."""
    import dataclasses

    for semi, skip in ((True, False), (False, True), (True, True)):
        model, params, cfg = build_model("agg")
        cfg = dataclasses.replace(cfg, semi_aggregate=semi, skip_mlm=skip)
        model = BiEncoder(cfg)
        dummy = {"input_ids": jnp.zeros((2, 6), jnp.int32),
                 "attention_mask": jnp.ones((2, 6), jnp.int32)}
        params = model.init(jax.random.PRNGKey(1), query=dummy,
                            passage=dummy)["params"]
        enc = Encoder(model, params, cfg,
                      EncodeConfig(batch_size=8, remove_dims=REMOVE))
        c_ids, c_mask = make_texts(rng, 16, 8)
        packed = enc.encode_corpus(
            iter_batches([f"d{i}" for i in range(16)], c_ids, c_mask, 8)
        )
        assert packed.values.shape == (16, 8 + 4)
        qv, _, qids = enc.encode_queries(
            iter_batches(["q0"], c_ids[:1], c_mask[:1], 8)
        )
        searcher = Searcher(
            DeviceIndex.from_packed(packed),
            SearchConfig(topk=3, mode="ip", query_batch=1),
        )
        results, _ = searcher.search_run(qids, qv)
        want = qv.astype(np.float64) @ np.asarray(
            jnp.asarray(packed.values, jnp.bfloat16).astype(jnp.float32)
        ).astype(np.float64).T
        assert results["q0"][0] == f"d{np.argmax(want[0])}", (semi, skip)
