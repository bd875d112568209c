import numpy as np
import jax.numpy as jnp
import pytest

from dhr_tpu.ops import (
    blockwise_topk,
    gip_scores_masked,
    gip_scores_pairwise,
    gip_scores_subindex,
    ip_scores,
    pad_indices_for_cls,
    quantize_per_dim,
    quantized_ip_scores,
    scale_cls_tail,
    threshold_query_values,
)
from oracle import gip_oracle


def make_pairs(rng, B, N, d, k):
    qv = rng.random((B, d)).astype(np.float32)
    pv = rng.random((N, d)).astype(np.float32)
    qi = rng.integers(0, k, (B, d)).astype(np.int32)
    pi = rng.integers(0, k, (N, d)).astype(np.int32)
    return qv, qi, pv, pi


def test_gip_masked_matches_oracle(rng):
    qv, qi, pv, pi = make_pairs(rng, 5, 11, 16, 4)
    got = gip_scores_masked(*map(jnp.asarray, (qv, qi, pv, pi)))
    np.testing.assert_allclose(np.asarray(got), gip_oracle(qv, qi, pv, pi), rtol=1e-5)


def test_gip_masked_chunked_equals_unchunked(rng):
    qv, qi, pv, pi = make_pairs(rng, 70, 9, 8, 3)
    a = gip_scores_masked(*map(jnp.asarray, (qv, qi, pv, pi)), q_chunk=16)
    b = gip_oracle(qv, qi, pv, pi)
    np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5)


def test_gip_subindex_matches_oracle(rng):
    qv, qi, pv, pi = make_pairs(rng, 6, 13, 32, 5)
    got = gip_scores_subindex(*map(jnp.asarray, (qv, qi, pv, pi)), num_folds=5)
    np.testing.assert_allclose(np.asarray(got), gip_oracle(qv, qi, pv, pi), rtol=1e-5)


def test_gip_pairwise_is_diagonal_of_full(rng):
    qv, qi, pv, pi = make_pairs(rng, 7, 7, 12, 4)
    pair = gip_scores_pairwise(*map(jnp.asarray, (qv, qi, pv, pi)))
    full = gip_oracle(qv, qi, pv, pi)
    np.testing.assert_allclose(np.asarray(pair), np.diag(full), rtol=1e-5)


def test_cls_tail_always_gated_open(rng):
    # With index planes padded by 1 over the CLS tail, GIP == lexical GIP +
    # plain IP on the tail (reference gip_retrieval.py:110-126).
    d_lex, d_cls = 8, 4
    qv, qi, pv, pi = make_pairs(rng, 3, 5, d_lex, 4)
    qc = rng.random((3, d_cls)).astype(np.float32)
    pc = rng.random((5, d_cls)).astype(np.float32)
    qv_full = np.concatenate([qv, qc], axis=1)
    pv_full = np.concatenate([pv, pc], axis=1)
    qi_full = pad_indices_for_cls(jnp.asarray(qi), d_cls)
    pi_full = pad_indices_for_cls(jnp.asarray(pi), d_cls)
    got = gip_scores_masked(
        jnp.asarray(qv_full), qi_full, jnp.asarray(pv_full), pi_full
    )
    want = gip_oracle(qv, qi, pv, pi) + qc @ pc.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_scale_cls_tail():
    v = jnp.ones((2, 6), jnp.float32)
    out = scale_cls_tail(v, lex_dim=4, lam=0.5)
    np.testing.assert_allclose(np.asarray(out[:, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), 0.5)


def test_threshold_matches_important_dims_gather(rng):
    # Thresholded full-dim GIP == the reference's gather over dims with
    # qv > theta (gip_retrieval.py:130-136).
    qv, qi, pv, pi = make_pairs(rng, 4, 9, 16, 4)
    theta = 0.5
    qv_t = threshold_query_values(jnp.asarray(qv), theta, lex_dim=16)
    got = gip_scores_masked(qv_t, jnp.asarray(qi), jnp.asarray(pv), jnp.asarray(pi))
    want = np.zeros((4, 9))
    for b in range(4):
        imp = np.where(qv[b] > theta)[0]
        for n in range(9):
            want[b, n] = sum(
                qv[b, j] * pv[n, j] for j in imp if qi[b, j] == pi[n, j]
            )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_ip_scores(rng):
    qv = rng.random((3, 8)).astype(np.float32)
    pv = rng.random((6, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ip_scores(jnp.asarray(qv), jnp.asarray(pv))), qv @ pv.T, rtol=1e-5
    )


def test_blockwise_topk_exact(rng):
    scores = rng.standard_normal((3, 1000)).astype(np.float32)
    v, i = blockwise_topk(jnp.asarray(scores), k=10, block=128)
    order = np.argsort(-scores, axis=-1)[:, :10]
    np.testing.assert_array_equal(np.asarray(i), order)
    np.testing.assert_allclose(
        np.asarray(v), np.take_along_axis(scores, order, axis=-1), rtol=1e-6
    )


def test_quantized_ip_close_to_exact(rng):
    qv = rng.random((4, 64)).astype(np.float32)
    pv = (rng.random((32, 64)).astype(np.float32) - 0.2) * 3.0
    plane = quantize_per_dim(jnp.asarray(pv))
    got = quantized_ip_scores(jnp.asarray(qv), plane)
    want = qv @ pv.T
    err = np.abs(np.asarray(got) - want) / (np.abs(want) + 1e-3)
    assert float(err.mean()) < 0.02
