"""Two-tier candidate escalation (SearchConfig.escalate_pool).

Tier 1 searches a small candidate pool; queries whose reranked topk-th
score lands within escalate_margin of the tier-1 stage-1 pool floor
re-dispatch at the full agip_topk.  The TPU-shaped analog of the
reference's one-size pool (gip_retrieval.py:142-148) with an adaptive
fast path; escalated queries reproduce the full-pool results exactly.
"""

import numpy as np
import pytest

from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher

from tests.test_retrieval import build_corpus, build_queries


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cfg(**kw):
    base = dict(topk=10, mode="gip", theta=0.35, rerank=True,
                agip_topk=100, query_batch=8, approx_candidates=False)
    base.update(kw)
    return SearchConfig(**base)


def test_escalate_all_equals_full_pool(rng):
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    full = Searcher(idx, _cfg())
    esc = Searcher(idx, _cfg(escalate_pool=20, escalate_margin=1e30))
    sf, rf = full.search(qv, qi)
    se, re_ = esc.search(qv, qi)
    assert esc.escalated_queries == 13
    np.testing.assert_array_equal(rf, re_)
    # tier-2 gathers queries from the resident arrays (jnp.take) where the
    # plain path dynamic-slices them; XLA fuses the two differently, so
    # rerank sums can differ by one f32 ULP
    np.testing.assert_allclose(sf, se, rtol=1e-6)


def test_escalate_never_equals_small_pool(rng):
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    small = Searcher(idx, _cfg(agip_topk=20))
    esc = Searcher(idx, _cfg(escalate_pool=20, escalate_margin=-1e30))
    ss, rs = small.search(qv, qi)
    se, re_ = esc.search(qv, qi)
    assert esc.escalated_queries == 0
    np.testing.assert_array_equal(rs, re_)
    np.testing.assert_allclose(ss, se)


def test_escalate_partial_matches_tiers(rng):
    """A mid margin escalates SOME queries; each query's results equal the
    tier it was served by, and escalation only improves full-pool overlap."""
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=29)
    idx = DeviceIndex.from_packed(packed)
    full = Searcher(idx, _cfg())
    small = Searcher(idx, _cfg(agip_topk=20))
    sf, rf = full.search(qv, qi)
    ss, rs = small.search(qv, qi)

    # pick the fixture's median margin so the escalated set is proper
    import jax.numpy as jnp

    probe = Searcher(idx, _cfg(agip_topk=20))
    qvs, qv1s, qif = probe._prep(jnp.asarray(qv), jnp.asarray(qi))
    v1, r1 = probe._stage1(qv1s, qif)
    v2, _ = probe._stage2(qvs, qif, r1)
    margins = np.asarray(v2[:, -1], np.float32) - np.asarray(
        v1.min(axis=-1), np.float32)
    mid = float(np.median(margins))

    esc = Searcher(idx, _cfg(escalate_pool=20, escalate_margin=mid))
    se, re_ = esc.search(qv, qi)
    n_esc = esc.escalated_queries
    assert 0 < n_esc < 29, n_esc

    served_full = np.array([np.array_equal(re_[i], rf[i]) for i in range(29)])
    served_small = np.array([np.array_equal(re_[i], rs[i]) for i in range(29)])
    assert np.all(served_full | served_small)
    assert served_full.sum() >= n_esc  # escalated ones match tier 2

    # escalation never loses full-pool rows vs the small pool alone
    for i in range(29):
        ov_esc = len(np.intersect1d(re_[i], rf[i]))
        ov_small = len(np.intersect1d(rs[i], rf[i]))
        assert ov_esc >= ov_small


def test_escalation_improves_recall_on_deficient_queries(rng):
    """On this synthetic set the 20-row pool IS deficient for some queries;
    escalating at a generous margin must recover them."""
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=29)
    idx = DeviceIndex.from_packed(packed)
    full = Searcher(idx, _cfg())
    small = Searcher(idx, _cfg(agip_topk=20))
    sf, rf = full.search(qv, qi)
    ss, rs = small.search(qv, qi)
    ov_small = np.mean([
        len(np.intersect1d(rs[i], rf[i])) / rf.shape[1] for i in range(29)
    ])
    assert ov_small < 1.0  # the fixture must actually stress the pool

    esc = Searcher(idx, _cfg(escalate_pool=20, escalate_margin=0.5))
    se, re_ = esc.search(qv, qi)
    ov_esc = np.mean([
        len(np.intersect1d(re_[i], rf[i])) / rf.shape[1] for i in range(29)
    ])
    assert ov_esc > ov_small


def test_escalate_with_approx_stratified_candidates(rng):
    """The bench operating point (approx_max_k + stratified slices +
    bf16 candidate scores) composes with escalation: escalate-all equals
    the full-pool searcher under the same candidate settings."""
    packed = build_corpus(rng, N=1024)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    kw = dict(topk=16, agip_topk=256, approx_candidates=True,
              candidate_recall=0.99, candidate_slices=2)
    full = Searcher(idx, _cfg(**kw))
    esc = Searcher(idx, _cfg(escalate_pool=64, escalate_margin=1e30, **kw))
    sf, rf = full.search(qv, qi)
    se, re_ = esc.search(qv, qi)
    assert esc.escalated_queries == 13
    np.testing.assert_array_equal(rf, re_)
    np.testing.assert_allclose(sf, se, rtol=1e-6)


def test_calibrate_escalation(rng):
    """The calibrated margin must actually deliver its promised coverage:
    searching with it reaches at least the reported overlap_after_mean."""
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=29)
    idx = DeviceIndex.from_packed(packed)
    cal = Searcher(idx, _cfg(escalate_pool=20, escalate_margin=0.0))
    report = cal.calibrate_escalation(qv, qi, miss_mass_target=0.95)
    assert report["overlap_small_mean"] < 1.0  # fixture stresses the pool
    assert 0.0 < report["frac_escalated"] <= 1.0
    assert report["overlap_after_mean"] >= report["overlap_small_mean"]

    full = Searcher(idx, _cfg())
    sf, rf = full.search(qv, qi)
    tuned = Searcher(idx, _cfg(escalate_pool=20,
                               escalate_margin=report["escalate_margin"]))
    st, rt = tuned.search(qv, qi)
    ov = np.mean([
        len(np.intersect1d(rt[i], rf[i])) / rf.shape[1] for i in range(29)
    ])
    assert ov >= report["overlap_after_mean"] - 1e-9
    assert tuned.escalated_queries == round(report["frac_escalated"] * 29)


def test_escalate_ip_candidates(rng):
    """Escalation also applies to IP-candidate configs (stage 1 is an MXU
    matmul; the floor is still the smallest admitted candidate score)."""
    packed = build_corpus(rng, N=500)
    qv, qi = build_queries(rng, B=13)
    idx = DeviceIndex.from_packed(packed)
    kw = dict(topk=10, mode="ip", theta=0.0, rerank=True, agip_topk=100,
              query_batch=8, approx_candidates=False)
    full = Searcher(idx, SearchConfig(**kw))
    esc = Searcher(idx, SearchConfig(escalate_pool=20,
                                     escalate_margin=1e30, **kw))
    sf, rf = full.search(qv, qi)
    se, re_ = esc.search(qv, qi)
    assert esc.escalated_queries == 13
    np.testing.assert_array_equal(rf, re_)
    np.testing.assert_allclose(sf, se, rtol=1e-6)


def test_calibrate_requires_escalation_pool(rng):
    packed = build_corpus(rng, N=200)
    idx = DeviceIndex.from_packed(packed)
    s = Searcher(idx, _cfg())
    with pytest.raises(ValueError, match="escalate_pool"):
        s.calibrate_escalation(np.zeros((4, 20), np.float32))


def test_escalate_validation():
    packed = build_corpus(np.random.default_rng(0), N=100)
    idx = DeviceIndex.from_packed(packed)
    with pytest.raises(ValueError, match="rerank"):
        Searcher(idx, SearchConfig(topk=10, rerank=False, escalate_pool=20))
    with pytest.raises(ValueError, match="must lie in"):
        Searcher(idx, _cfg(escalate_pool=5))       # < topk
    with pytest.raises(ValueError, match="must lie in"):
        Searcher(idx, _cfg(escalate_pool=100))     # >= agip_topk


def test_escalate_sharded_equals_single_device(rng, eight_devices):
    from dhr_tpu.parallel import make_mesh

    packed = build_corpus(rng, N=512)
    qv, qi = build_queries(rng, B=13)
    cfg = _cfg(escalate_pool=20, escalate_margin=0.05)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_mesh(axis="index")
    sharded = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = sharded.search(qv, qi)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_escalate_rejects_dense_index(rng):
    """A dense (indices=None) index has no rerank stage — escalation must
    fail loudly at construction, not crash on a missing tier-2."""
    from dhr_tpu.retrieval import PackedIndex

    values = rng.random((100, 8)).astype(np.float16)
    docids = np.asarray([f"d{i}" for i in range(100)], dtype=object)
    packed = PackedIndex(values, None, docids, lex_dim=0)
    idx = DeviceIndex.from_packed(packed)
    with pytest.raises(ValueError, match="dense"):
        Searcher(idx, SearchConfig(topk=10, mode="ip", rerank=True,
                                   agip_topk=100, escalate_pool=20))
