import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhr_tpu.encode import EncodeConfig, Encoder
from dhr_tpu.eval.beir import evaluate_beir, load_beir_dir
from dhr_tpu.eval.rerank import evaluate_rerank, make_pair_scorer
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig
from dhr_tpu.retrieval import SearchConfig
from dhr_tpu.utils import convert_ranking_to_trec

VOCAB = 70


def tiny_model(model_type="dhr"):
    cfg = RetrieverConfig(
        model_type=model_type,
        encoder=EncoderConfig.tiny(vocab_size=VOCAB, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        add_pooler=True, projection_dim=4, dlr_out_dim=8, agg_dim=8,
    )
    model = BiEncoder(cfg)
    dummy = {"input_ids": jnp.zeros((1, 4), jnp.int32),
             "attention_mask": jnp.ones((1, 4), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), query=dummy, passage=dummy)[
        "params"]
    return model, params, cfg


def test_rerank_eval_runs_and_is_consistent(rng):
    model, params, cfg = tiny_model("dhr")
    scorer = make_pair_scorer(model, params, cfg, remove_dims=6)
    examples = []
    for q in range(3):
        q_toks = rng.integers(1, VOCAB, 5).tolist()
        for p in range(6):
            p_toks = rng.integers(1, VOCAB, 7).tolist()
            examples.append((f"q{q}", q_toks, f"p{p}", p_toks, int(p == 0)))
    out = evaluate_rerank(scorer, examples, q_max_len=6, p_max_len=8,
                          batch_size=4)
    assert out["num_queries"] == 3
    for k in ("MAP", "RPrec", "NDCG", "MRR", "MRR@10"):
        assert 0.0 <= out[k] <= 1.0


def test_rerank_scores_match_direct_model(rng):
    """Pairwise scorer must equal the fused score from a direct forward."""
    from dhr_tpu.ops import densify, gip_scores_pairwise

    model, params, cfg = tiny_model("dhr")
    scorer = make_pair_scorer(model, params, cfg, remove_dims=6)
    q = {"input_ids": jnp.asarray(rng.integers(1, VOCAB, (2, 5)), jnp.int32),
         "attention_mask": jnp.ones((2, 5), jnp.int32)}
    p = {"input_ids": jnp.asarray(rng.integers(1, VOCAB, (2, 6)), jnp.int32),
         "attention_mask": jnp.ones((2, 6), jnp.int32)}
    got = np.asarray(scorer(q, p))
    q_reps, p_reps = model.apply({"params": params}, query=q, passage=p)
    qv, qi = densify(q_reps.lexical, 8, 6)
    pv, pi = densify(p_reps.lexical, 8, 6)
    want = np.asarray(gip_scores_pairwise(qv, qi, pv, pi)) + np.sum(
        np.asarray(q_reps.semantic) * np.asarray(p_reps.semantic), axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


class FakeTokenizer:
    def encode(self, text, add_special_tokens=False, max_length=None,
               truncation=True):
        ids = [(hash(w) % (VOCAB - 2)) + 2 for w in text.split()]
        return ids[: max_length or 16] or [1]


def write_beir_dataset(d):
    os.makedirs(os.path.join(d, "qrels"), exist_ok=True)
    corpus = [
        {"_id": f"c{i}", "title": f"title {i}", "text": f"body text {i} xyz"}
        for i in range(20)
    ]
    with open(os.path.join(d, "corpus.jsonl"), "w") as f:
        for row in corpus:
            f.write(json.dumps(row) + "\n")
    queries = [{"_id": f"q{i}", "text": f"body text {i}"} for i in range(4)]
    # one query whose id collides with a doc id to exercise self-hit filter
    queries.append({"_id": "c0", "text": "title 0"})
    with open(os.path.join(d, "queries.jsonl"), "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(d, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(4):
            f.write(f"q{i}\tc{i}\t1\n")
        f.write("c0\tc1\t1\n")


def test_load_beir_dir(tmp_path):
    d = str(tmp_path)
    write_beir_dataset(d)
    corpus, queries, qrels = load_beir_dir(d)
    assert len(corpus) == 20
    assert set(queries) == {"q0", "q1", "q2", "q3", "c0"}
    assert qrels["q1"] == {"c1": 1}


def test_evaluate_beir_end_to_end(tmp_path):
    d = str(tmp_path)
    write_beir_dataset(d)
    model, params, cfg = tiny_model("dhr")
    enc = Encoder(model, params, cfg,
                  EncodeConfig(batch_size=8, remove_dims=6))
    out = evaluate_beir(
        enc, SearchConfig(topk=10, mode="gip", query_batch=8),
        d, FakeTokenizer(), q_max_len=8, p_max_len=12, cls_id=1,
    )
    assert out["num_queries"] == 5
    for k in ("NDCG@10", "Recall@10", "R_cap@10", "NDCG@100"):
        assert 0.0 <= out[k] <= 1.0


def test_convert_ranking_to_trec(tmp_path):
    src = tmp_path / "rank.tsv"
    src.write_text("q1\td2\t1.5\nq1\td1\t2.5\n")
    out = str(tmp_path / "run.trec")
    convert_ranking_to_trec(str(src), out)
    lines = open(out).read().splitlines()
    assert lines[0].split()[:4] == ["q1", "Q0", "d1", "1"]
    assert lines[1].split()[:4] == ["q1", "Q0", "d2", "2"]


def test_rerank_eval_max_queries_stop(rng):
    """Reproduces the reference's 200-query stop as an option, not a quirk."""
    model, params, cfg = tiny_model("dense")
    scorer = make_pair_scorer(model, params, cfg)
    examples = []
    for q in range(6):
        q_toks = rng.integers(1, VOCAB, 4).tolist()
        for p in range(3):
            examples.append(
                (f"q{q}", q_toks, f"p{p}",
                 rng.integers(1, VOCAB, 5).tolist(), int(p == 0))
            )
    out = evaluate_rerank(scorer, examples, q_max_len=5, p_max_len=6,
                          batch_size=4, max_queries=3)
    assert out["num_queries"] == 3


def test_rerank_eval_max_queries_never_cuts_mid_query(rng):
    """Queries are counted as their rows are read: a flush that lands
    mid-buffer must not admit a partial extra query past the cap."""
    model, params, cfg = tiny_model("dense")
    scorer = make_pair_scorer(model, params, cfg)
    examples = []
    for q, n_rows in (("q0", 2), ("q1", 3)):
        q_toks = rng.integers(1, VOCAB, 4).tolist()
        for p in range(n_rows):
            examples.append(
                (q, q_toks, f"p{p}", rng.integers(1, VOCAB, 5).tolist(),
                 int(p == 0))
            )
    # batch_size=3 puts q1's first row in the same flush as all of q0
    out = evaluate_rerank(scorer, examples, q_max_len=5, p_max_len=6,
                          batch_size=3, max_queries=1)
    assert out["num_queries"] == 1


def test_download_beir_dataset_from_local_zip(tmp_path):
    """The download step unzips a pre-placed archive (the offline path) and
    reuses an already-extracted directory without touching the network."""
    import zipfile

    from dhr_tpu.eval.beir import download_beir_dataset

    src = tmp_path / "src" / "tinyset"
    write_beir_dataset(str(src))
    dl = tmp_path / "download"
    dl.mkdir()
    with zipfile.ZipFile(dl / "tinyset.zip", "w") as z:
        for root, _, files in os.walk(src):
            for name in files:
                p = os.path.join(root, name)
                z.write(p, os.path.relpath(p, src.parent))

    out = download_beir_dataset("tinyset", str(dl))
    assert os.path.exists(os.path.join(out, "corpus.jsonl"))
    corpus, queries, qrels = load_beir_dir(out)
    assert len(corpus) == 20

    # second call: reuses the extracted dir (delete the zip to prove it)
    os.unlink(dl / "tinyset.zip")
    assert download_beir_dataset("tinyset", str(dl)) == out


def test_download_beir_dataset_offline_error(tmp_path):
    """No zip, no dir, no (reachable) network -> actionable error."""
    import pytest as _pytest

    from dhr_tpu.eval.beir import download_beir_dataset

    with _pytest.raises(RuntimeError, match="place the zip"):
        download_beir_dataset(
            "nosuchset", str(tmp_path),
            url_template="http://localhost:1/{}.zip",
        )

def test_evaluate_beir_length_bucketing_same_metrics(tmp_path):
    """Bucketed encode order never changes id-keyed BEIR metrics."""
    d = str(tmp_path)
    write_beir_dataset(d)
    model, params, cfg = tiny_model("dhr")
    enc = Encoder(model, params, cfg,
                  EncodeConfig(batch_size=8, remove_dims=6))
    scfg = SearchConfig(topk=10, mode="gip", query_batch=8)
    plain = evaluate_beir(enc, scfg, d, FakeTokenizer(),
                          q_max_len=8, p_max_len=12, cls_id=1)
    bucketed = evaluate_beir(enc, scfg, d, FakeTokenizer(),
                             q_max_len=8, p_max_len=12, cls_id=1,
                             length_bucketing=True)
    for k in ("NDCG@10", "Recall@10", "R_cap@10", "NDCG@100", "num_queries"):
        assert bucketed[k] == pytest.approx(plain[k], abs=1e-6), k


def test_evaluate_beir_pack_same_metrics(tmp_path):
    """Token-packed corpus encode gives the same id-keyed BEIR metrics."""
    d = str(tmp_path)
    write_beir_dataset(d)
    model, params, cfg = tiny_model("dhr")
    enc = Encoder(model, params, cfg,
                  EncodeConfig(batch_size=8, remove_dims=6))
    scfg = SearchConfig(topk=10, mode="gip", query_batch=8)
    plain = evaluate_beir(enc, scfg, d, FakeTokenizer(),
                          q_max_len=8, p_max_len=12, cls_id=1)
    packed = evaluate_beir(enc, scfg, d, FakeTokenizer(),
                           q_max_len=8, p_max_len=12, cls_id=1,
                           pack=True, pack_segments=3)
    for k in ("NDCG@10", "Recall@10", "R_cap@10", "NDCG@100", "num_queries"):
        assert packed[k] == pytest.approx(plain[k], abs=1e-6), k
