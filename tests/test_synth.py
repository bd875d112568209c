"""The bench generator must keep its calibrated trained-rep statistics.

These pin the properties the honest-bench argument rests on (VERDICT r3
weak #1): query mass concentration (~30-50 dims above theta=0.3, so a
48-dim stage-1 scan >= the reference's every-above-theta-dim gather,
gip_retrieval.py:130-136), Zipf fold usage, and topical co-activation
that makes stage-1 scores predictive of exact scores.
"""

import numpy as np
import jax
import pytest

from dhr_tpu.retrieval.synth import (
    SynthConfig, synth_index_planes, synth_reps,
)

CFG = SynthConfig()


@pytest.fixture(scope="module")
def world():
    key = jax.random.PRNGKey(3)
    qv, qf, qz = synth_reps(key, 512, CFG, "query", stream=1)
    pv, pf, pz = synth_reps(key, 2048, CFG, "passage", stream=0)
    return tuple(np.asarray(x) for x in (qv, qf, qz, pv, pf, pz))


def test_query_concentration(world):
    qv = world[0]
    n_above = (qv[:, : CFG.lex_dim] > 0.3).sum(1)
    assert 30 <= n_above.mean() <= 50
    # stage-1 cap truncation must stay a tail event
    assert (n_above > 48).mean() < 0.05


def test_passage_profile(world):
    pv = world[3]
    lex = pv[:, : CFG.lex_dim]
    active = (lex > 0.05).sum(1)
    assert 100 <= active.mean() <= 200
    # right-skewed positive values, softmax-tail noise elsewhere
    assert lex.min() >= 0.0
    assert np.percentile(lex, 50) < 0.05 < np.percentile(lex, 90)


def test_fold_zipf_skew(world):
    pf = world[4]
    shares = []
    for d in range(0, CFG.lex_dim, 53):
        h = np.bincount(pf[:, d].astype(np.int64), minlength=CFG.n_folds)
        shares.append(h.max() / h.sum())
    # top fold per dim carries >> the uniform 1/39 share
    assert np.mean(shares) > 4.0 / CFG.n_folds
    assert pf.min() >= 0 and pf.max() < CFG.n_folds


def test_topical_coactivation(world):
    qv, qf, qz, pv, pf, pz = world

    def gip(i, j):
        m = qf[i] == pf[j]
        lex = float((qv[i, : CFG.lex_dim] * pv[j, : CFG.lex_dim] * m).sum())
        return lex + float(
            (qv[i, CFG.lex_dim:] * pv[j, CFG.lex_dim:]).sum()
        )

    same, cross = [], []
    for i in range(128):
        js = np.flatnonzero(pz == qz[i])
        if len(js):
            same.append(gip(i, int(js[0])))
        j = int((i * 131 + 17) % len(pz))
        if pz[j] != qz[i]:  # Zipf topics make accidental matches real
            cross.append(gip(i, j))
    # same-topic pairs separate by an order of magnitude: stage-1 scores
    # must be predictive of exact scores (the trained-rep regime)
    assert np.mean(same) > 5 * (abs(np.mean(cross)) + np.std(cross))


def test_index_planes_chunked():
    key = jax.random.PRNGKey(5)
    v_i8, folds, scales, topics = synth_index_planes(key, 4096, CFG,
                                                     n_chunks=4)
    assert v_i8.shape == (4096, CFG.lex_dim + CFG.cls_dim)
    assert v_i8.dtype == np.int8 and folds.dtype == np.int8
    assert scales.shape == (CFG.lex_dim + CFG.cls_dim,)
    assert np.all(np.asarray(scales) > 0)
    # dequantized corpus keeps the calibrated activity profile
    deq = np.asarray(v_i8[:, : CFG.lex_dim], np.float32) * np.asarray(
        scales
    )[None, : CFG.lex_dim]
    assert 100 <= (deq > 0.05).sum(1).mean() <= 200
    assert 0 <= topics.min() and topics.max() < CFG.n_topics
    # deterministic
    v2, f2, s2, t2 = synth_index_planes(key, 4096, CFG, n_chunks=4)
    np.testing.assert_array_equal(np.asarray(v_i8), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(topics), np.asarray(t2))


def test_index_planes_rejects_uneven_chunks():
    with pytest.raises(ValueError):
        synth_index_planes(jax.random.PRNGKey(0), 100, CFG, n_chunks=16)


def test_same_key_shares_world_across_chunking():
    """Queries (synth_reps) and the corpus (synth_index_planes) from one
    key live in one world: query topics co-activate with corpus rows."""
    key = jax.random.PRNGKey(7)
    v_i8, folds, scales, topics = synth_index_planes(key, 2048, CFG,
                                                     n_chunks=2)
    qv, qf, qz = synth_reps(key, 256, CFG, "query", stream=1)
    qv, qf, qz = map(np.asarray, (qv, qf, qz))
    deq = np.asarray(v_i8, np.float32) * np.asarray(scales)[None, :]
    pf, pz = np.asarray(folds), np.asarray(topics)

    def gip(i, j):
        m = qf[i] == pf[j]
        return float(
            (qv[i, : CFG.lex_dim] * deq[j, : CFG.lex_dim] * m).sum()
            + (qv[i, CFG.lex_dim:] * deq[j, CFG.lex_dim:]).sum()
        )

    same, cross = [], []
    for i in range(64):
        js = np.flatnonzero(pz == qz[i])
        if len(js):
            same.append(gip(i, int(js[0])))
        j = int((i * 113 + 29) % len(pz))
        if pz[j] != qz[i]:
            cross.append(gip(i, j))
    assert same, "no same-topic rows drawn — topic sharing broken?"
    assert np.mean(same) > 5 * (abs(np.mean(cross)) + np.std(cross))
