"""PQ codebook quantization: k-means quality, roundtrip, ADC score parity.

Reference equivalence target: faiss ``IndexPQ(dim, m=64, 8 bit, IP)``
(retrieval/quantize_index.py:27-38) — asymmetric-distance inner-product
scores against reconstructed vectors.
"""

import numpy as np
import jax.numpy as jnp

from dhr_tpu.ops.pq import (
    decode_pq,
    encode_pq,
    pq_ip_scores,
    pq_ip_scores_gather,
    pq_luts,
    train_pq,
    train_encode_pq_np,
)


def test_kmeans_recovers_clusters(rng):
    """Data drawn from <=256 distinct subvector values is coded losslessly."""
    m, d_sub, n = 4, 3, 512
    centers = rng.standard_normal((m, 32, d_sub)).astype(np.float32) * 3
    picks = rng.integers(0, 32, (m, n))
    sub = np.stack([centers[j, picks[j]] for j in range(m)], axis=1)  # n,m,d
    values = sub.reshape(n, m * d_sub)
    codes, centroids = train_encode_pq_np(values, m, iters=25, seed=1)
    recon = np.asarray(decode_pq(jnp.asarray(codes), jnp.asarray(centroids)))
    err = np.abs(recon - values).max()
    assert err < 1e-3, err


def test_pq_roundtrip_error_bounded(rng):
    """Smooth data: reconstruction error well under the data scale."""
    n, m, d_sub = 2048, 8, 4
    values = rng.standard_normal((n, m * d_sub)).astype(np.float32)
    codes, centroids = train_encode_pq_np(values, m, iters=10, seed=0)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    recon = np.asarray(decode_pq(jnp.asarray(codes), jnp.asarray(centroids)))
    rel = np.linalg.norm(recon - values) / np.linalg.norm(values)
    assert rel < 0.5, rel  # 256 centroids over 4-dim gaussians


def test_adc_scores_equal_reconstructed_ip(rng):
    """ADC (LUT) scores == q . decode(codes), both formulations."""
    n, b, m, d_sub = 256, 5, 8, 4
    values = rng.standard_normal((n, m * d_sub)).astype(np.float32)
    qv = rng.standard_normal((b, m * d_sub)).astype(np.float32)
    codes, centroids = train_encode_pq_np(values, m, iters=5, seed=0)
    recon = np.asarray(decode_pq(jnp.asarray(codes), jnp.asarray(centroids)))
    want = qv @ recon.T

    luts = pq_luts(jnp.asarray(qv), jnp.asarray(centroids))
    got_mxu = np.asarray(pq_ip_scores(luts, jnp.asarray(codes)))
    got_gather = np.asarray(pq_ip_scores_gather(luts, jnp.asarray(codes)))
    np.testing.assert_allclose(got_gather, want, atol=1e-3)
    # the MXU one-hot path holds the LUT in bf16 (rel ~4e-3 per term)
    np.testing.assert_allclose(got_mxu, want, atol=0.05 * np.abs(want).max())


def test_pq_candidate_recall_beats_random(rng):
    """PQ top-k candidates must contain most exact-IP top-k (synthetic)."""
    n, b, D = 4096, 8, 64
    values = rng.standard_normal((n, D)).astype(np.float32)
    qv = rng.standard_normal((b, D)).astype(np.float32)
    codes, centroids = train_encode_pq_np(values, m=16, iters=10, seed=0)
    luts = pq_luts(jnp.asarray(qv), jnp.asarray(centroids))
    pq_scores = np.asarray(pq_ip_scores_gather(luts, jnp.asarray(codes)))
    exact = qv @ values.T
    k, kc = 10, 100
    hits = 0
    for i in range(b):
        top_exact = set(np.argsort(-exact[i])[:k].tolist())
        top_pq = set(np.argsort(-pq_scores[i])[:kc].tolist())
        hits += len(top_exact & top_pq)
    recall = hits / (b * k)
    assert recall > 0.6, recall
