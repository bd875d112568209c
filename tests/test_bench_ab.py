"""tools/bench_ab.py — the interleaved whole-bench A/B harness.

The protocol it encodes (ABBA pairs, shared index, paired speedups) is
the repo's standing rule for confirming sub-10% perf deltas before
flipping defaults (docs/design.md); this test pins the harness's
plumbing at toy scale on CPU: override parsing, paired accounting, and
the quality guardrail (two arms that only differ in speed knobs must
return near-identical rankings).
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import bench_ab  # noqa: E402

from dhr_tpu.retrieval import SearchConfig  # noqa: E402


def test_parse_overrides_types():
    out = bench_ab.parse_overrides(
        ["pallas_unroll=4", "candidate_slices=auto", "rerank=true",
         "candidate_recall=0.99", "pallas_n_tile=none"], SearchConfig)
    assert out == {
        "pallas_unroll": 4, "candidate_slices": "auto", "rerank": True,
        "candidate_recall": 0.99, "pallas_n_tile": None,
    }
    # every parsed override must be applicable to the dataclass
    dataclasses.replace(SearchConfig(), **out)


def test_parse_overrides_rejects_unknown():
    with pytest.raises(SystemExit):
        bench_ab.parse_overrides(["not_a_field=1"], SearchConfig)
    with pytest.raises(SystemExit):
        bench_ab.parse_overrides(["missing-equals"], SearchConfig)


def test_parse_overrides_type_directed():
    # numeric-looking value for the str-typed 'mode' stays a string
    assert bench_ab.parse_overrides(["mode=123"], SearchConfig) == {
        "mode": "123"}
    # 'none' rejected for non-optional fields
    with pytest.raises(SystemExit):
        bench_ab.parse_overrides(["agip_topk=none"], SearchConfig)
    # bool literal rejected for non-bool fields
    with pytest.raises(SystemExit):
        bench_ab.parse_overrides(["agip_topk=true"], SearchConfig)
    # junk rejected for numeric-only fields
    with pytest.raises(SystemExit):
        bench_ab.parse_overrides(["agip_topk=fast"], SearchConfig)
    # int literal onto a float field parses as float
    assert bench_ab.parse_overrides(
        ["candidate_recall=1"], SearchConfig) == {"candidate_recall": 1.0}


def test_ab_run_toy(tmp_path, capsys):
    """End-to-end at toy scale: arms differing only in candidate_slices
    must agree on rankings and produce the paired-accounting fields."""
    out = tmp_path / "ab.json"
    bench_ab.main([
        "--rows", "2048", "--queries", "16", "--pairs", "2",
        "--query-batch", "16", "--a", "candidate_slices=1",
        "--b", "candidate_slices=4", "--out", str(out),
        "--a", "agip_topk=512", "--b", "agip_topk=512",
    ])
    report = json.loads(out.read_text())
    assert report["pairs"] == 2
    assert len(report["pass_times_a_s"]) == 2
    assert len(report["paired_speedup_b_over_a"]) == 2
    assert report["b_wins_pairs"] in (0, 1, 2)
    # speed knobs only -> rankings effectively identical at the head
    assert report["ranking_overlap_a_vs_b"]["@10"] >= 0.95
    assert "verdict" in report
    # stdout carries the same JSON document
    assert json.loads(capsys.readouterr().out) == report
