"""CI-scale checks for the pipeline dress-rehearsal tool (tools/
pipeline_rehearsal.py): the synthetic topical wordpiece world and the
theta-auto calibration.  The full run (train -> encode -> index -> search
-> eval through the CLI verbs) is exercised by the tool itself with
``--quick``; these tests pin the world-generator properties that make the
rehearsal's learn-to-retrieve assertion meaningful."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from pipeline_rehearsal import (  # noqa: E402
    FIRST_TOKEN,
    MAX_STAGED_RUNGS,
    STAGED_FLOOR,
    VOCAB,
    _ratio,
    make_queries,
    make_world,
    zipf_background,
)


def test_staged_quality_ratio():
    assert _ratio(0.09, 0.10) == 0.9
    assert _ratio(0.2, 0.1) == 2.0
    # nothing to preserve -> trivially passing
    assert _ratio(0.0, 0.0) == 1.0
    # MISSING metric (key rename) -> loud failure, never a silent pass
    # that would disable the exit-2 quality gate
    for num, den in ((None, None), (0.0, None), (None, 0.1)):
        with pytest.raises(KeyError):
            _ratio(num, den)
    # the contract constants the rehearsal asserts against
    assert 0.0 < STAGED_FLOOR <= 1.0 and MAX_STAGED_RUNGS >= 1


def test_world_token_ranges_and_lengths():
    rng = np.random.default_rng(0)
    passages, z, pools = make_world(rng, n_topics=8, pool_size=12,
                                    n_corpus=64)
    assert len(passages) == 64 and z.shape == (64,) and pools.shape == (8, 12)
    for p in passages:
        a = np.asarray(p)
        assert 16 <= len(a) <= 120
        assert a.min() >= FIRST_TOKEN and a.max() < VOCAB


def test_zipf_background_is_skewed():
    rng = np.random.default_rng(1)
    toks = zipf_background(rng, 20000)
    # head-heavy: the lowest-5% token band holds far more than 5% of mass
    head = (toks < FIRST_TOKEN + (VOCAB - FIRST_TOKEN) // 20).mean()
    assert head > 0.3


def test_queries_come_from_source_passage():
    rng = np.random.default_rng(2)
    passages, z, pools = make_world(rng, n_topics=4, pool_size=12,
                                    n_corpus=32)
    pids = np.arange(8)
    queries = make_queries(rng, passages, z, pools, pids)
    assert len(queries) == 8
    for q, pid in zip(queries, pids):
        assert 4 <= len(q) <= 8
        assert set(q) <= set(passages[pid])


def test_theta_auto_targets_40_dims():
    # mirror of the tool's auto rule: median query scans ~40 dims
    rng = np.random.default_rng(3)
    qvals = np.abs(rng.normal(0.0, 0.5, (32, 768))).astype(np.float32)
    kth = np.sort(qvals, axis=1)[:, -40]
    theta = max(float(np.median(kth)), 1e-3)
    above = (qvals > theta).sum(axis=1)
    assert 20 <= np.median(above) <= 60


def test_default_topics_keeps_cousins_per_topic_constant():
    from pipeline_rehearsal import default_topics

    assert default_topics(102_400, quick=False) == 512   # the 100k run
    assert default_topics(1_024_000, quick=False) == 5120  # the 1M run
    # ~200 cousins/topic at every non-quick scale >= 12.8k passages
    for n in (102_400, 1_024_000, 8_841_823):
        assert abs(n / default_topics(n, False) - 200) <= 1
    assert default_topics(2048, quick=True) == 32
    assert default_topics(1000, quick=False) == 64  # floor


def test_family_flags_parse_against_the_real_cli():
    """Every family's flag set must stay parseable by the actual verbs the
    rehearsal drives (train and encode share the model-arg group)."""
    from dhr_tpu.cli.main import build_parser

    from pipeline_rehearsal import family_flags

    ap = build_parser()
    for family in ("dhr", "dense", "agg", "colbert"):
        flags = family_flags(family, "/tmp/ckpt")
        args = ap.parse_args([
            "encode", *flags, "--input", "x.jsonl", "--output", "y.npz"])
        assert args.model == ("dhr" if family == "dhr" else family)
