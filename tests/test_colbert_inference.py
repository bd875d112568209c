"""ColBERT inference path parity against the reference torch implementation.

The reference's ``ColBERTForInference`` (ColBERT/modeling.py:340-442) is
executed directly as the oracle: the same tiny checkpoint (HF dir + tied
pooler sidecar) is loaded by both frameworks and must produce matching token
reps, matching row-aligned inference scores, and matching offline
``score_pairs`` output.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dhr_tpu.encode import EncodeConfig, Encoder, iter_batches  # noqa: E402
from dhr_tpu.models.hf_io import (  # noqa: E402
    convert_hf_mlm_to_params,
    encoder_config_from_hf,
    load_hf_state_dict,
    save_sidecar_head,
)
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig  # noqa: E402
from dhr_tpu.retrieval.colbert import (  # noqa: E402
    maxsim_listwise,
    maxsim_pairwise,
    score_pairs,
)

_REF = "/root/reference"

from tests.test_hf_io import tiny_distilbert_dir  # noqa: E402

HID, PROJ = 32, 16


def _load_reference_colbert(ckpt_dir):
    if not os.path.isdir(_REF):
        pytest.skip("reference not available")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from tevatron.ColBERT.modeling import ColBERTForInference

    model = ColBERTForInference.build(model_name_or_path=ckpt_dir)
    model.eval()
    return model


def make_checkpoint(tmp_path, rng):
    d, _ = tiny_distilbert_dir(tmp_path)
    kernel = (rng.standard_normal((HID, PROJ)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal(PROJ) * 0.1).astype(np.float32)
    save_sidecar_head(d, "pooler", {"kernel": kernel, "bias": bias}, None,
                      input_dim=HID, output_dim=PROJ)
    return d


def make_my_model(ckpt_dir):
    enc_cfg = encoder_config_from_hf(ckpt_dir, dtype=jnp.float32)
    cfg = RetrieverConfig(
        model_type="colbert", encoder=enc_cfg, add_pooler=True,
        projection_dim=PROJ,
    )
    model = BiEncoder(cfg)
    import argparse

    from dhr_tpu.cli.main import _load_init_params

    args = argparse.Namespace(model_name_or_path=ckpt_dir)
    _, params = _load_init_params(args, cfg)
    return model, params, cfg


def batch_arrays(rng, n, L, vocab=99):
    ids = rng.integers(3, vocab, (n, L)).astype(np.int64)
    lens = rng.integers(3, L + 1, n)
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int64)
    ids = ids * mask  # zero out padding ids like a real tokenizer would
    return ids, mask


def torch_batch(ids, mask):
    return {"input_ids": torch.from_numpy(ids),
            "attention_mask": torch.from_numpy(mask)}


def jax_batch(ids, mask):
    return {"input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.asarray(mask, jnp.int32)}


def test_colbert_encode_and_scores_match_reference(rng, tmp_path):
    d = make_checkpoint(tmp_path, rng)
    ref = _load_reference_colbert(d)
    model, params, cfg = make_my_model(d)

    B, Lq, Lp = 4, 8, 12
    q_ids, q_mask = batch_arrays(rng, B, Lq)
    p_ids, p_mask = batch_arrays(rng, B, Lp)

    with torch.no_grad():
        t_q_cls, t_q_tok = ref.encode_query(torch_batch(q_ids, q_mask))
        t_p_cls, t_p_tok = ref.encode_passage(torch_batch(p_ids, p_mask))
        t_out = ref(query=torch_batch(q_ids, q_mask),
                    passage=torch_batch(p_ids, p_mask))

    q_reps, p_reps = model.apply(
        {"params": params}, query=jax_batch(q_ids, q_mask),
        passage=jax_batch(p_ids, p_mask), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(q_reps.token_cls), t_q_cls.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(q_reps.token), t_q_tok.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p_reps.token), t_p_tok.numpy(), atol=2e-4)

    # row-aligned inference scores (ColBERT/modeling.py:187-190)
    mine = maxsim_pairwise(
        jnp.concatenate([q_reps.token_cls, q_reps.token], axis=1),
        jnp.concatenate([p_reps.token_cls, p_reps.token], axis=1),
    )
    np.testing.assert_allclose(
        np.asarray(mine), t_out.scores.numpy(), atol=2e-3)

    # teacher-style listwise scores (ColBERT/modeling.py:214-219 + cls)
    with torch.no_grad():
        t_list = ref.listwise_maxsim(t_q_tok, t_p_tok) + ref.listwise_maxsim(
            t_q_cls, t_p_cls)
    mine_list = maxsim_listwise(
        jnp.concatenate([q_reps.token_cls, q_reps.token], axis=1),
        jnp.concatenate([p_reps.token_cls, p_reps.token], axis=1),
    )
    np.testing.assert_allclose(
        np.asarray(mine_list), t_list.numpy(), atol=2e-3)


def test_colbert_offline_score_pairs_matches_reference(rng, tmp_path):
    """encode_tokens -> saved reps -> score_pairs == torch inference scores,
    including f16 storage rounding staying within tolerance."""
    d = make_checkpoint(tmp_path, rng)
    ref = _load_reference_colbert(d)
    model, params, cfg = make_my_model(d)

    n_q, n_p, Lq, Lp = 3, 6, 8, 12
    q_ids, q_mask = batch_arrays(rng, n_q, Lq)
    p_ids, p_mask = batch_arrays(rng, n_p, Lp)
    qids = [f"q{i}" for i in range(n_q)]
    pids = [f"p{i}" for i in range(n_p)]

    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=2))
    q_reps, q_out_ids = enc.encode_tokens(
        iter_batches(qids, q_ids, q_mask, 2), "query")
    p_reps, p_out_ids = enc.encode_tokens(
        iter_batches(pids, p_ids, p_mask, 2), "passage")
    assert q_out_ids == qids and p_out_ids == pids
    assert q_reps.shape == (n_q, Lq, PROJ) and q_reps.dtype == np.float16

    pairs = [(q, p) for q in qids for p in pids][:10]
    scores = score_pairs(q_reps, qids, p_reps, pids, pairs, batch_size=4)

    with torch.no_grad():
        for (q, p), s in zip(pairs, scores):
            qi, pi = qids.index(q), pids.index(p)
            t_out = ref(
                query=torch_batch(q_ids[qi:qi + 1], q_mask[qi:qi + 1]),
                passage=torch_batch(p_ids[pi:pi + 1], p_mask[pi:pi + 1]),
            )
            t = float(t_out.scores)
            # reps are stored f16 (rel ~1e-3); tolerance scales with |score|
            assert abs(t - float(s)) < 5e-3 * max(1.0, abs(t)), (q, p, t, s)


def test_colbert_score_cli(rng, tmp_path):
    """The encode -> colbert-score CLI surface end to end."""
    import subprocess
    import sys as _sys

    d = make_checkpoint(tmp_path, rng)
    corpus = tmp_path / "corpus.jsonl"
    queries = tmp_path / "queries.jsonl"
    with open(corpus, "w") as f:
        for i in range(5):
            f.write(json.dumps(
                {"text_id": f"p{i}",
                 "text": rng.integers(3, 99, 9).tolist()}) + "\n")
    with open(queries, "w") as f:
        for i in range(2):
            f.write(json.dumps(
                {"text_id": f"q{i}",
                 "text": rng.integers(3, 99, 5).tolist()}) + "\n")
    pairs = tmp_path / "pairs.tsv"
    with open(pairs, "w") as f:
        for qi in range(2):
            for pi in range(5):
                f.write(f"q{qi}\tp{pi}\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # keep the TPU-relay sitecustomize (.axon_site) OUT of the subprocess:
    # this is a CPU-only test, and the axon client hangs at import when the
    # relay is mid-claim (e.g. another process is on the chip)
    inherited = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + inherited
    )

    def run(*argv):
        proc = subprocess.run(
            [_sys.executable, "-m", "dhr_tpu", *argv], env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        assert proc.returncode == 0, proc.stdout[-2000:]

    common = ["--model", "colbert", "--model-name-or-path", d,
              "--add-pooler", "--projection-dim", str(PROJ),
              "--cls-token-id", "1", "--sep-token-id", "2",
              "--q-max-len", "8", "--p-max-len", "12", "--batch-size", "4"]
    run("encode", *common, "--input", str(corpus),
        "--output", str(tmp_path / "p_reps"))
    run("encode", *common, "--encode-is-qry", "--input", str(queries),
        "--output", str(tmp_path / "q_reps"))
    run("colbert-score", "--query-reps", str(tmp_path / "q_reps"),
        "--passage-reps", str(tmp_path / "p_reps"),
        "--pairs", str(pairs), "--output", str(tmp_path / "scores.tsv"))
    rows = [line.split("\t") for line in open(tmp_path / "scores.tsv")]
    assert len(rows) == 10
    assert all(np.isfinite(float(r[2])) for r in rows)

    # TREC output mode ranks each query's pairs by score
    run("colbert-score", "--query-reps", str(tmp_path / "q_reps"),
        "--passage-reps", str(tmp_path / "p_reps"),
        "--pairs", str(pairs), "--trec",
        "--output", str(tmp_path / "run.trec"))
    lines = open(tmp_path / "run.trec").read().splitlines()
    assert len(lines) == 10
    scores_by_q = {}
    for line in lines:
        qid, _, pid, rank, score, _ = line.split()
        scores_by_q.setdefault(qid, []).append(float(score))
    for vals in scores_by_q.values():
        assert vals == sorted(vals, reverse=True)
