import json
import numpy as np
import pytest

from dhr_tpu.eval import (
    average_precision,
    evaluate_run,
    hole_at_k,
    mrr_at_k,
    ndcg_at_k,
    ndcg_from_ranked,
    r_precision,
    recall_at_k,
    recall_cap_at_k,
    reciprocal_rank,
    rerank_metrics,
    top_k_accuracy,
)
from dhr_tpu.retrieval import merge_runs, read_qrels, read_run, write_run


def simple_case():
    qrels = {
        "q1": {"d1": 1, "d3": 1},
        "q2": {"d9": 1},
    }
    run = {
        "q1": {"d1": 3.0, "d2": 2.0, "d3": 1.0},
        "q2": {"d7": 5.0, "d8": 4.0, "d9": 3.0},
    }
    return qrels, run


def test_mrr():
    qrels, run = simple_case()
    # q1: first rel at rank 1 -> 1.0 ; q2: rank 3 -> 1/3
    assert abs(mrr_at_k(qrels, run, 10) - (1.0 + 1 / 3) / 2) < 1e-9
    # at cutoff 2 q2 misses
    assert abs(mrr_at_k(qrels, run, 2) - 0.5) < 1e-9


def test_recall_and_cap():
    qrels, run = simple_case()
    assert abs(recall_at_k(qrels, run, 3) - 1.0) < 1e-9
    assert abs(recall_at_k(qrels, run, 1) - (0.5 + 0.0) / 2) < 1e-9
    # cap: q1 min(1, 2 rel)=1, top-1 has d1 -> 1.0 ; q2 0/1
    assert abs(recall_cap_at_k(qrels, run, 1) - 0.5) < 1e-9


def test_recall_strict_and_zero_positive_count():
    from dhr_tpu.eval import zero_positive_queries

    qrels, run = simple_case()
    qrels = dict(qrels)
    qrels["q3"] = {"d9": 0}  # judged but no positive
    run = dict(run)
    run["q3"] = {"d9": 1.0}
    assert zero_positive_queries(qrels) == 1
    # default (documented deviation): q3 contributes 0 to the mean
    assert abs(recall_at_k(qrels, run, 3) - 2.0 / 3) < 1e-9
    # strict = the reference/BEIR convention: undefined -> raise
    with pytest.raises(ValueError, match="no positive judgment"):
        recall_at_k(qrels, run, 3, strict=True)
    with pytest.raises(ValueError, match="no positive judgment"):
        recall_cap_at_k(qrels, run, 1, strict=True)


def test_hole_and_topk_accuracy():
    qrels, run = simple_case()
    # top-2: q1 has d2 unjudged (1/2), q2 has d7,d8 unjudged (2/2)
    assert abs(hole_at_k(qrels, run, 2) - (0.5 + 1.0) / 2) < 1e-9
    assert abs(top_k_accuracy(qrels, run, 1) - 0.5) < 1e-9


def test_ndcg_perfect_ranking_is_one():
    qrels = {"q": {"a": 2, "b": 1}}
    run = {"q": {"a": 9.0, "b": 8.0, "c": 7.0}}
    assert abs(ndcg_at_k(qrels, run, 10) - 1.0) < 1e-9


def test_ndcg_known_value():
    qrels = {"q": {"a": 1}}
    run = {"q": {"b": 9.0, "a": 8.0}}  # rel at rank 2
    want = (1 / np.log2(3)) / 1.0
    assert abs(ndcg_at_k(qrels, run, 10) - want) < 1e-9


def test_array_metrics():
    rels = np.array([0, 1, 0, 1])
    assert abs(average_precision(rels) - (0.5 + 0.5) / 2) < 1e-9
    assert abs(r_precision(rels) - 0.5) < 1e-9
    assert abs(reciprocal_rank(rels) - 0.5) < 1e-9
    assert reciprocal_rank(np.array([0, 0]), k=10) == 0.0
    assert abs(ndcg_from_ranked(np.array([1, 0])) - 1.0) < 1e-9
    m = rerank_metrics([rels, np.array([1, 0, 0])])
    assert abs(m["MRR"] - (0.5 + 1.0) / 2) < 1e-9
    assert set(m) == {"MAP", "RPrec", "NDCG", "MRR", "MRR@10"}


def test_evaluate_run_bundle():
    qrels, run = simple_case()
    out = evaluate_run(qrels, run, k_values=(10,))
    assert set(out) == {"MRR@10", "nDCG@10", "Recall@10", "R_cap@10"}


def test_trec_roundtrip(tmp_path):
    results = {"q1": ["d1", "q1", "d2"], "q2": ["d9"]}
    scores = {"q1": [3.0, 2.5, 2.0], "q2": [1.0]}
    p = str(tmp_path / "run.trec")
    write_run(p, results, scores, run_name="test")
    run = read_run(p)
    # self-hit q1->q1 filtered
    assert run == {"q1": {"d1": 3.0, "d2": 2.0}, "q2": {"d9": 1.0}}
    lines = open(p).read().splitlines()
    assert lines[0].split() == ["q1", "Q0", "d1", "1", "3.0", "test"]
    # rank renumbered after the filtered row
    assert lines[1].split()[3] == "2"


def test_qrels_reader(tmp_path):
    p = tmp_path / "qrels.tsv"
    p.write_text("q1 0 d1 1\nq1 0 d2 0\nq2 d9 2\n")
    qrels = read_qrels(str(p))
    assert qrels == {"q1": {"d1": 1, "d2": 0}, "q2": {"d9": 2}}


def test_merge_runs(tmp_path):
    r1, r2 = str(tmp_path / "a.trec"), str(tmp_path / "b.trec")
    write_run(r1, {"q": ["d1", "d2"]}, {"q": [5.0, 1.0]})
    write_run(r2, {"q": ["d3"]}, {"q": [3.0]})
    out = str(tmp_path / "merged.trec")
    merge_runs([r1, r2], out, topk=2)
    merged = read_run(out)
    assert list(merged["q"].keys()) == ["d1", "d3"]


# ---------------------------------------------------------------------------
# Direct parity against the reference implementations, executed as oracles.
# ---------------------------------------------------------------------------

import importlib.util
import os

import pytest

_REF = "/root/reference"


def _load_ref(relpath, name):
    path = os.path.join(_REF, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference not available: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_eval_case(rng, n_q=7, n_docs=40, k_run=25):
    qrels, run = {}, {}
    docs = [f"d{i}" for i in range(n_docs)]
    for qi in range(n_q):
        qid = f"q{qi}"
        judged = rng.choice(docs, size=6, replace=False)
        # every query gets >= 1 positive (reference recall_cap divides by it)
        rels = {d: int(rng.integers(0, 2)) for d in judged}
        rels[judged[0]] = 1
        qrels[qid] = rels
        scored = rng.choice(docs, size=k_run, replace=False)
        run[qid] = {d: float(rng.random()) for d in scored}
    return qrels, run


def test_run_metrics_match_reference_custom_metrics(rng):
    cm = _load_ref("retrieval/evaluation/custom_metrics.py", "ref_custom_metrics")
    qrels, run = _random_eval_case(rng)
    ks = [1, 3, 10]
    ref_mrr = cm.mrr(qrels, run, ks)
    ref_cap = cm.recall_cap(qrels, run, ks)
    ref_hole = cm.hole(qrels, run, ks)
    ref_acc = cm.top_k_accuracy(qrels, run, ks)
    for k in ks:
        # reference rounds to 5 decimals
        assert abs(mrr_at_k(qrels, run, k) - ref_mrr[f"MRR@{k}"]) < 1e-5
        assert abs(recall_cap_at_k(qrels, run, k) - ref_cap[f"R_cap@{k}"]) < 1e-5
        assert abs(hole_at_k(qrels, run, k) - ref_hole[f"Hole@{k}"]) < 1e-5
        assert abs(top_k_accuracy(qrels, run, k) - ref_acc[f"Accuracy@{k}"]) < 1e-5


def test_rerank_metrics_match_reference_utils_metrics(rng):
    um = _load_ref("tevatron/utils/metrics.py", "ref_utils_metrics")
    from dhr_tpu.eval import ndcg_reference

    mmap = ["MAP", "RPrec", "MRR", "MRR@10", "NDCG"]
    cases = [
        (rng.random(50), rng.integers(0, 2, 50)),  # binary, some positives
        (rng.random(30), np.zeros(30, np.int64)),  # no positives
        (rng.random(20), rng.integers(0, 3, 20)),  # mixed graded labels
    ]
    ranked_all = []
    ref_acc = np.zeros(len(mmap))
    for scores, labels in cases:
        order = np.asarray(scores).argsort()[::-1]
        # reference: gt = positions of positive labels, pred = ranked positions
        gt = set(np.where(np.asarray(labels) > 0)[0].tolist())
        ref_acc += um.metrics(gt=gt, pred=order, metrics_map=mmap)
        ranked_all.append(np.asarray(labels)[order])
    ours = rerank_metrics(ranked_all, reference_compat=True)
    ref = ref_acc / len(cases)
    for i, name in enumerate(mmap):
        assert abs(ours[name] - ref[i]) < 1e-6, (name, ours[name], ref[i])
    # sanity: the graded case is where reference_compat differs from default
    assert ndcg_reference(ranked_all[2]) != ndcg_from_ranked(ranked_all[2]) or (
        (ranked_all[2] > 0).sum() == 0
    )


def test_eval_verb_strict_flag(tmp_path, capsys):
    from dhr_tpu.cli.main import main

    qrels = tmp_path / "q.qrels"
    qrels.write_text("q0 0 d0 1\nq1 0 d9 0\n")  # q1 has no positive
    run = tmp_path / "r.trec"
    run.write_text("q0 Q0 d0 1 2.0 t\nq1 Q0 d0 1 1.0 t\n")
    main(["eval", "--qrels", str(qrels), "--run", str(run)])
    out = json.loads(capsys.readouterr().out)
    assert out["zero_positive_queries"] == 1
    with pytest.raises(ValueError, match="no positive judgment"):
        main(["eval", "--qrels", str(qrels), "--run", str(run), "--strict"])
