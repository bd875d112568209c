"""calibrate_pool: the per-corpus agip_topk frontier measurement.

The candidate pool is the dominant throughput/quality lever of the rerank
path (design.md "Operating-point re-sweep", round 4); ``calibrate_pool``
measures per-pool q/s + final-top-k overlap on a query sample and
recommends the smallest pool meeting an overlap target.  The reference
engine has no such knob (its --agip_topk only sizes the rerank,
gip_retrieval.py:142-148), so these tests pin our own semantics: overlap
is measured against the largest swept pool, and the recommendation is the
smallest pool of the descending all-qualify prefix.
"""

import numpy as np
import pytest

from dhr_tpu.retrieval import DeviceIndex, SearchConfig, calibrate_pool

from tests.test_retrieval import build_corpus, build_queries


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _cfg(**kw):
    base = dict(topk=32, mode="gip", theta=0.35, rerank=True,
                agip_topk=256, query_batch=8, approx_candidates=False)
    base.update(kw)
    return SearchConfig(**base)


def test_report_shape_and_reference_pool_is_exact(rng):
    packed = build_corpus(rng, N=512)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    report = calibrate_pool(idx, _cfg(), qv, qi,
                            pools=(256, 64, 32), passes=2)
    assert report["reference_pool"] == 256
    assert report["n_queries"] == 13
    assert set(report["pools"]) == {256, 64, 32}
    ref = report["pools"][256]
    # the largest pool is its own reference: overlap exactly 1
    assert ref["overlap_mean"] == 1.0 and ref["overlap_min"] == 1.0
    for p, row in report["pools"].items():
        assert len(row["pass_s"]) == 2
        assert row["qps_median"] > 0
        assert 0.0 <= row["overlap_min"] <= row["overlap_mean"] <= 1.0


def test_recommendation_is_smallest_qualifying_prefix(rng):
    packed = build_corpus(rng, N=512)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    report = calibrate_pool(idx, _cfg(), qv, qi,
                            pools=(256, 128, 64, 32), passes=1,
                            overlap_target=0.9)
    pools = sorted(report["pools"], reverse=True)
    expect = pools[0]
    for p in pools:
        if report["pools"][p]["overlap_mean"] >= 0.9:
            expect = p
        else:
            break
    assert report["recommended_pool"] == expect
    # an impossible target recommends the reference pool itself
    report2 = calibrate_pool(idx, _cfg(), qv, qi, pools=(256, 32),
                             passes=1, overlap_target=1.0 + 1e-9)
    assert report2["recommended_pool"] == 256


def test_small_pool_overlap_degrades_vs_full(rng):
    """A pool equal to topk must miss rows the full pool's rerank
    promotes from below the stage-1 cut (theta truncation reorders)."""
    packed = build_corpus(rng, N=512)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    report = calibrate_pool(idx, _cfg(), qv, qi, pools=(256, 32), passes=1)
    assert report["pools"][32]["overlap_mean"] < 1.0
    assert (report["pools"][32]["overlap_mean"]
            <= report["pools"][256]["overlap_mean"])


def test_validation(rng):
    packed = build_corpus(rng, N=128)
    qv, qi = build_queries(rng, B=5)
    idx = DeviceIndex.from_packed(packed)
    with pytest.raises(ValueError, match="rerank"):
        calibrate_pool(idx, _cfg(rerank=False), qv, qi, pools=(64, 32))
    with pytest.raises(ValueError, match="topk"):
        calibrate_pool(idx, _cfg(), qv, qi, pools=(64, 8))
    with pytest.raises(ValueError, match="two pool"):
        calibrate_pool(idx, _cfg(), qv, qi, pools=(64,))


def test_cli_pool_calibrate(rng, tmp_path):
    """The search verb's --pool-calibrate prints/writes the JSON report."""
    import json

    from dhr_tpu.cli.main import main

    packed = build_corpus(rng, N=256)
    qv, qi = build_queries(rng, B=9)
    index_path = tmp_path / "idx"
    packed.save(str(index_path))
    np.savez(tmp_path / "q.npz", values=qv, indices=qi)
    with open(tmp_path / "q.npz.qids.json", "w") as f:
        json.dump([f"q{i}" for i in range(9)], f)
    out = tmp_path / "pool.json"
    main([
        "search", "--index-path", str(index_path),
        "--query-path", str(tmp_path / "q.npz"),
        "--output", str(out), "--topk", "16", "--theta", "0.35",
        "--rerank", "--agip-topk", "128", "--query-batch", "8",
        "--exact-candidates", "--pool-calibrate", "128,32,16",
        "--pool-passes", "1",
    ])
    report = json.loads(out.read_text())
    assert report["reference_pool"] == 128
    assert set(int(k) for k in report["pools"]) == {128, 32, 16}
    assert report["pools"]["128"]["overlap_mean"] == 1.0
