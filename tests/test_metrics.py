import numpy as np

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
