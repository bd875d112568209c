"""Search engine tests against a brute-force NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from dhr_tpu.parallel import make_mesh
from dhr_tpu.retrieval import DeviceIndex, PackedIndex, SearchConfig, Searcher


def bf16_exact(x):
    """Round to values exactly representable in bf16 (device dtype) so the
    f16-stored oracle and the bf16 device index agree bit-for-bit."""
    return np.asarray(
        jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float16)


def build_corpus(rng, N=500, lex=16, cls=4, k=5):
    pv = bf16_exact(rng.random((N, lex)))
    pc = bf16_exact(rng.random((N, cls)))
    values = np.concatenate([pv, pc], axis=1)
    indices = rng.integers(0, k, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    return PackedIndex(values, indices, docids, lex_dim=lex)


def build_queries(rng, B=7, lex=16, cls=4, k=5):
    qv = np.concatenate(
        [rng.random((B, lex)), rng.random((B, cls))], axis=1
    ).astype(np.float32)
    qi = rng.integers(0, k, (B, lex)).astype(np.int32)
    return qv, qi


def gip_oracle_scores(qv, qi, packed, theta=0.0, lam=1.0):
    """Reference-semantics scores: lambda CLS scale, theta gather, gate."""
    lex = packed.lex_dim
    qv = qv.astype(np.float64).copy()
    qv[:, lex:] *= lam
    pv = packed.values.astype(np.float64)
    pi = packed.indices
    B, N = qv.shape[0], packed.num_rows
    out = np.zeros((B, N))
    for b in range(B):
        active = qv[b] > theta if theta > 0 else np.ones_like(qv[b], bool)
        for n in range(N):
            s = 0.0
            for j in range(qv.shape[1]):
                if not active[j]:
                    continue
                if j >= lex or qi[b, j] == pi[n, j]:
                    s += qv[b, j] * pv[n, j]
            out[b, n] = s
    return out


def topk_oracle(scores, k):
    order = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=-1), order


def test_brute_force_gip_matches_oracle(rng):
    packed = build_corpus(rng, N=200)
    qv, qi = build_queries(rng, B=5)
    idx = DeviceIndex.from_packed(packed)
    s = Searcher(idx, SearchConfig(topk=10, mode="gip", theta=0.0,
                                   query_batch=8))
    scores, rows = s.search(qv, qi)
    want = gip_oracle_scores(qv, qi, packed)
    wv, wi = topk_oracle(want, 10)
    np.testing.assert_array_equal(rows, wi)
    np.testing.assert_allclose(scores, wv, rtol=2e-3)


def test_theta_approx_with_rerank_matches_oracle(rng):
    """theta-pass candidates + exact rerank == reference two-stage search."""
    packed = build_corpus(rng, N=300)
    qv, qi = build_queries(rng, B=4)
    idx = DeviceIndex.from_packed(packed)
    theta, agip, k = 0.5, 50, 10
    s = Searcher(idx, SearchConfig(topk=k, mode="gip", theta=theta,
                                   rerank=True, agip_topk=agip,
                                   max_important_dims=20, query_batch=4))
    scores, rows = s.search(qv, qi)
    partial = gip_oracle_scores(qv, qi, packed, theta=theta)
    full = gip_oracle_scores(qv, qi, packed)
    for b in range(4):
        cand = np.argsort(-partial[b], kind="stable")[:agip]
        re = full[b, cand]
        order = cand[np.argsort(-re, kind="stable")[:k]]
        np.testing.assert_array_equal(rows[b], order)
        np.testing.assert_allclose(scores[b], np.sort(re)[::-1][:k], rtol=2e-3)


def test_ip_mode_matches_matmul(rng):
    packed = build_corpus(rng, N=150)
    qv, qi = build_queries(rng, B=3)
    idx = DeviceIndex.from_packed(packed)
    s = Searcher(idx, SearchConfig(topk=5, mode="ip", query_batch=4))
    scores, rows = s.search(qv, qi)
    want = qv.astype(np.float64) @ packed.values.astype(np.float64).T
    _, wi = topk_oracle(want, 5)
    np.testing.assert_array_equal(rows, wi)


def test_sharded_search_equals_single_device(rng, eight_devices):
    packed = build_corpus(rng, N=400)
    qv, qi = build_queries(rng, B=6)
    cfg = SearchConfig(topk=20, mode="gip", theta=0.3, rerank=True,
                       agip_topk=64, max_important_dims=16, query_batch=8)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_mesh(eight_devices, axis="index")
    sharded = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = sharded.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


def test_quantized_index_close_to_exact(rng):
    packed = build_corpus(rng, N=300)
    qv, qi = build_queries(rng, B=4)
    exact = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(topk=20, mode="gip", query_batch=4))
    quant = Searcher(DeviceIndex.from_packed(packed.quantize()),
                     SearchConfig(topk=20, mode="gip", query_batch=4))
    s1, r1 = exact.search(qv, qi)
    s2, r2 = quant.search(qv, qi)
    # top-1 should survive 8-bit quantization on random data
    assert (r1[:, 0] == r2[:, 0]).mean() >= 0.75
    np.testing.assert_allclose(s1[:, 0], s2[:, 0], rtol=0.05)


def test_dense_index_without_indices(rng):
    N, D = 100, 12
    values = rng.random((N, D)).astype(np.float16)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, None, docids, lex_dim=D)
    s = Searcher(DeviceIndex.from_packed(packed),
                 SearchConfig(topk=7, mode="ip", query_batch=4))
    qv = rng.random((3, D)).astype(np.float32)
    scores, rows = s.search(qv)
    want = qv.astype(np.float64) @ values.astype(np.float64).T
    _, wi = topk_oracle(want, 7)
    np.testing.assert_array_equal(rows, wi)


def test_search_run_and_trec(rng, tmp_path):
    from dhr_tpu.retrieval import read_run, write_run

    packed = build_corpus(rng, N=64)
    qv, qi = build_queries(rng, B=2)
    s = Searcher(DeviceIndex.from_packed(packed),
                 SearchConfig(topk=5, query_batch=2))
    results, scores = s.search_run(["q0", "q1"], qv, qi)
    assert set(results) == {"q0", "q1"}
    assert len(results["q0"]) == 5
    p = str(tmp_path / "run.trec")
    write_run(p, results, scores)
    assert len(read_run(p)["q0"]) == 5


def test_index_save_load_roundtrip(rng, tmp_path):
    packed = build_corpus(rng, N=32)
    path = str(tmp_path / "index.npz")
    packed.save(path)
    loaded = PackedIndex.load(path)
    np.testing.assert_array_equal(loaded.values, packed.values)
    np.testing.assert_array_equal(loaded.indices, packed.indices)
    assert list(loaded.docids) == list(packed.docids)
    assert loaded.lex_dim == packed.lex_dim


def test_reference_pickle_ingestion(rng, tmp_path):
    import pickle

    packed = build_corpus(rng, N=16)
    p = str(tmp_path / "corpus.split00.pt")
    with open(p, "wb") as f:
        pickle.dump(
            [packed.values, packed.indices, [str(d) for d in packed.docids]], f
        )
    loaded = PackedIndex.load_reference_pickle(p, lex_dim=16)
    np.testing.assert_array_equal(loaded.values, packed.values)
    merged = PackedIndex.merge_glob(str(tmp_path / "*.pt"), lex_dim=16)
    assert merged.num_rows == 16


def test_merge_shards(rng):
    a = build_corpus(rng, N=10)
    b = build_corpus(rng, N=14)
    m = PackedIndex.merge([a, b])
    assert m.num_rows == 24
    np.testing.assert_array_equal(m.values[:10], a.values)
    np.testing.assert_array_equal(m.values[10:], b.values)


def test_index_stats_and_avg_dims(rng):
    from dhr_tpu.retrieval.stats import avg_important_dims, index_stats

    packed = build_corpus(rng, N=50, k=3)
    stats = index_stats(packed)
    assert stats["rows"] == 50 and stats["lex_dim"] == 16
    assert 0 < stats["density"] <= 1
    assert stats["fold_usage"]["n_folds_used"] <= 3
    qv, _ = build_queries(rng, B=4)
    avg = avg_important_dims(qv, theta=0.5, lex_dim=16)
    assert 0 <= avg <= 16


def test_ip_candidates_with_gip_rerank(rng):
    """Reference's --IP --rerank: full-IP candidates, exact-GIP rerank."""
    packed = build_corpus(rng, N=200)
    qv, qi = build_queries(rng, B=3)
    s = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=8, mode="ip", theta=0.5, rerank=True,
                     agip_topk=40, query_batch=4),
    )
    scores, rows = s.search(qv, qi)
    dev_vals = packed.values.astype(np.float64)
    partial = qv.astype(np.float64) @ dev_vals.T  # full IP, theta ignored
    full = gip_oracle_scores(qv, qi, packed)
    for b in range(3):
        cand = np.argsort(-partial[b], kind="stable")[:40]
        re = full[b, cand]
        order = cand[np.argsort(-re, kind="stable")[:8]]
        np.testing.assert_array_equal(rows[b], order)


def test_theta_pipeline_recall_vs_brute_force(rng):
    """theta=0.3 + rerank@K recovers nearly all of the brute-force top-10
    (the 'equal conditions' operating point, BASELINE.md)."""
    N, lex, cls = 2000, 64, 8
    pv = np.exp(-4.0 * rng.random((N, lex))).astype(np.float16)
    pc = (rng.standard_normal((N, cls)) * 0.3).astype(np.float16)
    values = np.concatenate([pv, pc], axis=1)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    idx = DeviceIndex.from_packed(packed)

    qv = np.concatenate([
        np.exp(-4.0 * rng.random((8, lex))),
        rng.standard_normal((8, cls)) * 0.3,
    ], axis=1).astype(np.float32)
    qi = rng.integers(0, 5, (8, lex)).astype(np.int32)

    exact = Searcher(idx, SearchConfig(topk=10, theta=0.0, query_batch=8))
    approx = Searcher(idx, SearchConfig(topk=10, theta=0.3, rerank=True,
                                        agip_topk=200, max_important_dims=32,
                                        query_batch=8))
    _, r_exact = exact.search(qv, qi)
    _, r_approx = approx.search(qv, qi)
    recall = np.mean([
        len(set(r_exact[b]) & set(r_approx[b])) / 10 for b in range(8)
    ])
    assert recall >= 0.8, recall


def test_searcher_pallas_path_matches_scan(rng):
    """Force the Pallas kernel (interpret mode on CPU) through the Searcher."""
    N = 512  # multiple of the smallest tile (4096? no — use explicit tile)
    packed = build_corpus(rng, N=4096, lex=16, cls=4, k=5)
    qv, qi = build_queries(rng, B=4)
    cfg_scan = SearchConfig(topk=10, theta=0.3, rerank=True, agip_topk=64,
                            max_important_dims=8, query_batch=4,
                            use_pallas=False, approx_candidates=False)
    cfg_pallas = SearchConfig(topk=10, theta=0.3, rerank=True, agip_topk=64,
                              max_important_dims=8, query_batch=4,
                              use_pallas=True, pallas_n_tile=4096,
                              pallas_interpret=True, approx_candidates=False,
                              candidate_bf16=False)
    idx = DeviceIndex.from_packed(packed)
    s_scan = Searcher(idx, cfg_scan)
    s_pal = Searcher(idx, cfg_pallas)
    v1, r1 = s_scan.search(qv, qi)
    v2, r2 = s_pal.search(qv, qi)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, rtol=1e-4)


def test_searcher_pallas_bf16_candidates_rerank(rng):
    """Default candidate_bf16 mode: bf16 scores pick the candidate pool, the
    exact f32 rerank orders it — top results must overlap the f32 path
    heavily, and returned scores must equal the exact-GIP oracle."""
    packed = build_corpus(rng, N=4096, lex=16, cls=4, k=5)
    qv, qi = build_queries(rng, B=4)
    common = dict(topk=10, theta=0.3, rerank=True, agip_topk=256,
                  max_important_dims=8, query_batch=4, use_pallas=True,
                  pallas_n_tile=4096, pallas_interpret=True,
                  approx_candidates=False)
    s_f32 = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(candidate_bf16=False, **common))
    s_b16 = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(candidate_bf16=True, **common))
    v1, r1 = s_f32.search(qv, qi)
    v2, r2 = s_b16.search(qv, qi)
    full = gip_oracle_scores(qv, qi, packed)
    for b in range(4):
        overlap = len(set(r1[b].tolist()) & set(r2[b].tolist())) / 10
        assert overlap >= 0.9, (b, overlap)
        # scores come from the exact rerank regardless of candidate dtype
        np.testing.assert_allclose(v2[b], full[b, r2[b]], rtol=2e-3)


def test_pq_mode_candidates_with_gip_rerank(rng):
    """mode='pq' (reference PQ_IP_retrieval): ADC candidates over PQ codes,
    exact-GIP rerank — final top-k scores must equal the exact-GIP oracle on
    the candidates it picked."""
    packed = build_corpus(rng, N=512).quantize_pq(m=4, iters=10)
    assert packed.pq_codes.shape == (512, 4)
    qv, qi = build_queries(rng, B=4)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=10, mode="pq", rerank=True, agip_topk=128,
                     query_batch=4),
    )
    scores, row_ids = searcher.search(qv, qi)
    full = gip_oracle_scores(qv, qi, packed)
    # reranked scores are exact GIP for the rows returned
    got_rows = np.asarray(row_ids)
    for b in range(4):
        np.testing.assert_allclose(
            scores[b], full[b, got_rows[b]], rtol=1e-2,
        )
    # candidate quality: PQ top-10 should mostly hit the exact top-10
    _, want_rows = topk_oracle(full, 10)
    overlap = np.mean([
        len(set(got_rows[b]) & set(want_rows[b])) / 10 for b in range(4)
    ])
    assert overlap >= 0.6, overlap


def test_pq_index_save_load_roundtrip(rng, tmp_path):
    packed = build_corpus(rng, N=128).quantize_pq(m=4, iters=5)
    path = str(tmp_path / "pq_index.npz")
    packed.save(path)
    back = PackedIndex.load(path)
    np.testing.assert_array_equal(back.pq_codes, packed.pq_codes)
    np.testing.assert_allclose(back.pq_centroids, packed.pq_centroids)
    # sliced shards keep codes aligned with rows
    sl = back.slice_rows(16, 64)
    np.testing.assert_array_equal(sl.pq_codes, packed.pq_codes[16:64])


def test_pq_sharded_equals_single_device(rng, eight_devices):
    packed = build_corpus(rng, N=320).quantize_pq(m=4, iters=5)
    qv, qi = build_queries(rng, B=4)
    cfg = SearchConfig(topk=10, mode="pq", rerank=True, agip_topk=64,
                       query_batch=4)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_mesh(eight_devices, axis="index")
    sharded = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = sharded.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


@pytest.mark.parametrize("lam", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("theta", [0.0, 0.2, 0.5])
def test_lambda_theta_grid_matches_oracle(rng, lam, theta):
    """(lambda, theta) interaction: theta thresholds the lambda-SCALED query
    values, CLS dims included, exactly like the reference loads (lambda at
    gip_retrieval.py:281-283) then gathers (qv > theta, :130-136)."""
    packed = build_corpus(rng, N=160, lex=12, cls=4)
    qv, qi = build_queries(rng, B=3, lex=12, cls=4)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=8, mode="gip", theta=theta, lam=lam, rerank=False,
                     max_important_dims=16, query_batch=3),
    )
    scores, rows = searcher.search(qv, qi)
    want = gip_oracle_scores(qv, qi, packed, theta=theta, lam=lam)
    wv, _ = topk_oracle(want, 8)
    np.testing.assert_allclose(np.asarray(scores), wv, rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("lam", [0.5, 2.0])
def test_lambda_theta_rerank_grid_matches_full_oracle(rng, lam):
    """theta candidates + exact rerank at lambda != 1: final scores must be
    the FULL lambda-scaled GIP (rerank uses unthresholded queries)."""
    packed = build_corpus(rng, N=160, lex=12, cls=4)
    qv, qi = build_queries(rng, B=3, lex=12, cls=4)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=8, mode="gip", theta=0.3, lam=lam, rerank=True,
                     agip_topk=80, max_important_dims=16, query_batch=3,
                     approx_candidates=False),
    )
    scores, rows = searcher.search(qv, qi)
    full = gip_oracle_scores(qv, qi, packed, lam=lam)
    got_rows = np.asarray(rows)
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(scores)[b], full[b, got_rows[b]], rtol=2e-2, atol=1e-3
        )


def test_threshold_keep_cls_unit():
    """keep_cls=True exempts the CLS tail from the theta gate."""
    import jax.numpy as jnp

    from dhr_tpu.ops.gip import threshold_query_values

    qv = jnp.asarray([[0.1, 0.9, 0.05, 0.2]], jnp.float32)  # lex 2 + cls 2
    uniform = np.asarray(threshold_query_values(qv, 0.3, lex_dim=2))
    np.testing.assert_allclose(uniform, [[0.0, 0.9, 0.0, 0.0]])
    kept = np.asarray(threshold_query_values(qv, 0.3, lex_dim=2,
                                             keep_cls=True))
    np.testing.assert_allclose(kept, [[0.0, 0.9, 0.05, 0.2]])


@pytest.mark.parametrize("lam", [1.0, 0.25])
@pytest.mark.parametrize("theta", [0.0, 0.4])
@pytest.mark.parametrize("quantized", [False, True])
def test_device_prep_matches_host_prepare_queries(rng, lam, theta, quantized):
    """search()'s on-device query prep (lambda/theta/scale folding, index
    widening+padding) must be the exact twin of the host-side
    ``prepare_queries`` it replaced (the relay-transfer rework)."""
    packed = build_corpus(rng, N=96)
    if quantized:
        packed = packed.quantize()
    idx = DeviceIndex.from_packed(packed)
    s = Searcher(idx, SearchConfig(
        topk=5, theta=theta, lam=lam, rerank=True, agip_topk=16))
    qv, qi = build_queries(rng)
    want_full, want_s1, want_qi = s.prepare_queries(qv, qi)
    got_full, got_s1, got_qi = s._prep(
        jnp.asarray(qv), jnp.asarray(qi.astype(np.int8)))
    np.testing.assert_allclose(np.asarray(got_full), want_full, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(got_s1), want_s1, rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(got_qi), want_qi)
    # and with no query indices at all (dense-style query)
    want = s.prepare_queries(qv, None)
    got = s._prep(jnp.asarray(qv), jnp.ones((qv.shape[0], 1), jnp.int8))
    np.testing.assert_allclose(np.asarray(got[1]), want[1], rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(got[2]), want[2])


def test_search_batching_odd_sizes_consistent(rng):
    """The dynamic-slice batched loop must return identical results for any
    query_batch (padding rows never leak into real outputs)."""
    packed = build_corpus(rng, N=200)
    qv, qi = build_queries(rng, B=11)
    outs = []
    for bs in (3, 4, 11, 64):
        s = Searcher(
            DeviceIndex.from_packed(packed),
            SearchConfig(topk=7, theta=0.3, rerank=True, agip_topk=32,
                         query_batch=bs),
        )
        outs.append(s.search(qv, qi))
    for v, r in outs[1:]:
        np.testing.assert_array_equal(r, outs[0][1])
        np.testing.assert_allclose(v, outs[0][0], rtol=1e-6)


def test_int8_lambda_theta_rerank_matches_oracle_ranking(rng):
    """int8 planes + lambda + theta + rerank: the exact-rerank stage works in
    the quantized domain with scales folded into the query; rankings must
    track the float oracle's head (quantization noise only)."""
    packed = build_corpus(rng, N=300)
    qv, qi = build_queries(rng, B=5)
    oracle = gip_oracle_scores(qv, qi, packed, theta=0.0, lam=0.5)
    s = Searcher(
        DeviceIndex.from_packed(packed.quantize()),
        SearchConfig(topk=10, theta=0.35, lam=0.5, rerank=True,
                     agip_topk=80, approx_candidates=False),
    )
    scores, rows = s.search(qv, qi)
    _, want_rows = topk_oracle(oracle, 10)
    overlap = np.mean([
        len(set(rows[b]) & set(want_rows[b])) / 10 for b in range(5)
    ])
    assert overlap >= 0.9, overlap


def test_hybrid_host_mesh_search_equals_single_device(rng, eight_devices):
    """(host, index) DCN-leading mesh: same rankings as the unsharded path."""
    from dhr_tpu.parallel import make_hybrid_mesh

    packed = build_corpus(rng, N=400)
    qv, qi = build_queries(rng, B=6)
    cfg = SearchConfig(topk=20, mode="gip", theta=0.3, rerank=True,
                       agip_topk=64, max_important_dims=16, query_batch=8)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_hybrid_mesh(eight_devices, num_hosts=2)
    assert mesh.axis_names == ("host", "index") and mesh.shape["host"] == 2
    idx = DeviceIndex.from_packed(packed, mesh=mesh)
    assert idx.shard_axes == ("host", "index")
    hybrid = Searcher(idx, cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = hybrid.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


def test_hybrid_host_mesh_ip_mode(rng, eight_devices):
    from dhr_tpu.parallel import make_hybrid_mesh

    packed = build_corpus(rng, N=160)
    qv, qi = build_queries(rng, B=3)
    mesh = make_hybrid_mesh(eight_devices, num_hosts=4)
    s = Searcher(DeviceIndex.from_packed(packed, mesh=mesh),
                 SearchConfig(topk=5, mode="ip", query_batch=4))
    scores, rows = s.search(qv, qi)
    want = qv.astype(np.float64) @ packed.values.astype(np.float64).T
    _, wi = topk_oracle(want, 5)
    np.testing.assert_array_equal(rows, wi)


def test_pq_hybrid_mesh_equals_single_device(rng, eight_devices):
    """PQ codes shard over the collapsed (host, index) axes too."""
    from dhr_tpu.parallel import make_hybrid_mesh

    packed = build_corpus(rng, N=320).quantize_pq(m=4, iters=5)
    qv, qi = build_queries(rng, B=4)
    cfg = SearchConfig(topk=10, mode="pq", rerank=True, agip_topk=64,
                       query_batch=4)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_hybrid_mesh(eight_devices, num_hosts=2)
    hybrid = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = hybrid.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


def test_search_query_count_bucketing(rng):
    """Varying query totals pad to power-of-two batch slots; results for
    every real query are unchanged by the padding."""
    packed = build_corpus(rng, N=200)
    idx = DeviceIndex.from_packed(packed)
    s = Searcher(idx, SearchConfig(topk=5, mode="gip", theta=0.0,
                                   query_batch=4))
    for B in (1, 4, 5, 9, 13):
        qv, qi = build_queries(rng, B=B)
        scores, rows = s.search(qv, qi)
        assert scores.shape == (B, 5) and rows.shape == (B, 5)
        full = gip_oracle_scores(qv, qi, packed)
        _, wi = topk_oracle(full, 5)
        np.testing.assert_array_equal(rows, wi)


@pytest.mark.parametrize("num_hosts", [1, 4, 8])
def test_hybrid_mesh_degenerate_shapes(rng, eight_devices, num_hosts):
    """(1, 8), (4, 2) and (8, 1) host splits all reproduce 1-D rankings."""
    from dhr_tpu.parallel import make_hybrid_mesh

    packed = build_corpus(rng, N=320)
    qv, qi = build_queries(rng, B=4)
    cfg = SearchConfig(topk=10, mode="gip", theta=0.3, rerank=True,
                       agip_topk=64, max_important_dims=16, query_batch=4)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_hybrid_mesh(eight_devices, num_hosts=num_hosts)
    hybrid = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = hybrid.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


def test_int8_quantized_index_on_hybrid_mesh(rng, eight_devices):
    """int8 planes + folded scales shard over the hybrid axes too."""
    from dhr_tpu.parallel import make_hybrid_mesh

    packed = build_corpus(rng, N=320).quantize()
    assert packed.value_scales is not None
    qv, qi = build_queries(rng, B=4)
    cfg = SearchConfig(topk=10, mode="gip", theta=0.0, query_batch=4)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_hybrid_mesh(eight_devices, num_hosts=2)
    hybrid = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    s1, r1 = single.search(qv, qi)
    s2, r2 = hybrid.search(qv, qi)
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_array_equal(r1, r2)


def test_layout_row_ip_rerank_matches_both(rng):
    """layout='row' (single plane copy, half the HBM) with ip+rerank gives
    the same results as the default two-layout index."""
    import jax.numpy as jnp

    N, lex, cls = 96, 12, 4
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    cfg = SearchConfig(topk=7, mode="ip", rerank=True, agip_topk=32,
                       query_batch=4)
    both = Searcher(DeviceIndex.from_packed(packed), cfg)
    row = Searcher(DeviceIndex.from_packed(packed, layout="row"), cfg)
    assert row.index.values_T is None and row.index.indices_T is None
    qv = values[:4].astype(np.float32)
    qi = indices[:4].astype(np.int32)
    sb, rb = both.search(qv, qi)
    sr, rr = row.search(qv, qi)
    np.testing.assert_array_equal(rb, rr)
    np.testing.assert_allclose(sb, sr, rtol=1e-5, atol=1e-5)


def test_layout_dim_gip_matches_both(rng):
    """layout='dim' (stage-1-only gip, no rerank planes) == default."""
    N, lex, cls = 96, 12, 4
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    cfg = SearchConfig(topk=7, mode="gip", theta=0.0, query_batch=4)
    both = Searcher(DeviceIndex.from_packed(packed), cfg)
    dim = Searcher(DeviceIndex.from_packed(packed, layout="dim"), cfg)
    assert dim.index.values is None and dim.index.indices is None
    qv = values[:4].astype(np.float32)
    qi = indices[:4].astype(np.int32)
    sb, rb = both.search(qv, qi)
    sd, rd = dim.search(qv, qi)
    np.testing.assert_array_equal(rb, rd)
    np.testing.assert_allclose(sb, sd, rtol=1e-5, atol=1e-5)


def test_layout_validation_errors(rng):
    """Impossible (layout, mode) combinations fail loudly at build time."""
    import pytest

    N, lex = 32, 8
    values = (rng.random((N, lex + 2)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    with pytest.raises(ValueError, match="dim-major"):
        Searcher(DeviceIndex.from_packed(packed, layout="row"),
                 SearchConfig(mode="gip", theta=0.1, query_batch=4))
    with pytest.raises(ValueError, match="row-major"):
        Searcher(DeviceIndex.from_packed(packed, layout="dim"),
                 SearchConfig(mode="gip", theta=0.1, rerank=True,
                              query_batch=4))
    with pytest.raises(ValueError, match="layout"):
        DeviceIndex.from_packed(packed, layout="rows")


def test_stratified_candidates_match_unstratified(rng):
    """candidate_slices splits the approx selection per column band; with
    CPU's exact approx_max_k fallback and a pool covering the corpus the
    final reranked results must equal the unstratified path."""
    N, lex, cls = 2048, 12, 4
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    common = dict(topk=10, mode="gip", theta=0.1, rerank=True,
                  agip_topk=256, query_batch=4)
    plain = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(candidate_slices=1, **common))
    strat = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(candidate_slices=4, **common))
    from dhr_tpu.retrieval.searcher import _pick_slices
    assert _pick_slices(4, 2048, 256) == 4  # the stratified path IS active
    qv = values[:4].astype(np.float32)
    qi = indices[:4].astype(np.int32)
    sp, rp = plain.search(qv, qi)
    ss, rs = strat.search(qv, qi)
    np.testing.assert_array_equal(rp[:, :10], rs[:, :10])
    np.testing.assert_allclose(sp[:, :10], ss[:, :10], rtol=1e-5, atol=1e-5)


def test_pick_slices_constraints():
    from dhr_tpu.retrieval.searcher import _pick_slices

    assert _pick_slices("auto", 1_638_400, 10000) == 16
    assert _pick_slices("auto", 1_638_400, 256) == 4   # k/S >= 64
    assert _pick_slices(1, 1_638_400, 10000) == 1
    assert _pick_slices("auto", 1000, 10000) == 1      # nothing divides/fits
    assert _pick_slices(16, 2048, 1024) == 1           # width vs share guard
    # auto refuses high pool fractions (n < 8k) — slice edges visibly move
    # the pool there (measured on the parity fixture); explicit S may force
    assert _pick_slices("auto", 2000, 500) == 1
    assert _pick_slices(4, 2000, 500) == 4


def test_pick_pallas_tile_fused_block_rule():
    """The fused-candidates reduced out block is (1, t/(128*G), 128);
    Mosaic requires the middle dim to be a multiple of 8 or equal to the
    full reduced dim.  G=16 at the bench shard size must NOT pick 204800
    (middle dim 100 — an AOT compile error on hardware)."""
    from dhr_tpu.retrieval.searcher import _pick_pallas_tile

    t16 = _pick_pallas_tile(1_638_400, value_bytes=1, unroll=8,
                            fused_block=16)
    assert t16 is not None
    assert t16 % (128 * 16) == 0
    assert (t16 // (128 * 16)) % 8 == 0 or t16 == 1_638_400
    # G=8 keeps a legal large tile
    t8 = _pick_pallas_tile(1_638_400, value_bytes=1, unroll=8,
                           fused_block=8)
    assert t8 is not None and ((t8 // (128 * 8)) % 8 == 0
                               or t8 == 1_638_400)
    # single-tile shard: equality with the array dims is also legal
    t_eq = _pick_pallas_tile(102_400, value_bytes=1, unroll=8,
                             fused_block=16)
    assert t_eq in (None, 102_400) or (t_eq // (128 * 16)) % 8 == 0


def test_pick_row_chunks():
    """Auto mode chunks only above ~2M rows; J = ceil(rows/target) with the
    remainder handled as a tail slice, so ANY row count chunks (MS MARCO's
    8,841,823 is prime)."""
    from dhr_tpu.retrieval.searcher import _pick_row_chunks, _row_chunk_split

    assert _pick_row_chunks(0, 1_638_400) == 1          # under auto floor
    for n in (8_806_400, 8_841_823):                    # 8.8M synth + real (prime)
        j = _pick_row_chunks(0, n)
        chunk, main = _row_chunk_split(n, j)
        assert j > 1 and chunk <= 512 * 1024
        assert 0 <= n - main < chunk                    # tail smaller than a chunk
        assert chunk % 512 == 0                         # lane-friendly main chunks
    assert _pick_row_chunks(-1, 8_806_400) == 1         # -1 = off
    assert _pick_row_chunks(64, 256) == 4               # explicit target
    assert _pick_row_chunks(100, 97) == 1               # whole plane fits target
    assert _pick_row_chunks(50, 97) == 2                # prime: 2 chunks + tail


def test_row_chunked_ip_rerank_matches_unchunked(rng):
    """--row-chunk stage 1 (layout='row', the 8.8M-scale --IP+rerank
    operating mode) returns the same rankings as the unchunked path with
    exact candidates, and agreeing top-k with approximate candidates."""
    N, lex, cls = 256, 12, 4
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    qv = values[:4].astype(np.float32)
    qi = indices[:4].astype(np.int32)

    base_kw = dict(topk=7, mode="ip", rerank=True, agip_topk=32,
                   query_batch=4, approx_candidates=False)
    plain = Searcher(DeviceIndex.from_packed(packed, layout="row"),
                     SearchConfig(**base_kw, row_chunk=-1))
    chunked = Searcher(DeviceIndex.from_packed(packed, layout="row"),
                       SearchConfig(**base_kw, row_chunk=64))
    sp, rp = plain.search(qv, qi)
    sc, rc = chunked.search(qv, qi)
    np.testing.assert_array_equal(rp, rc)
    np.testing.assert_allclose(sp, sc, rtol=1e-5, atol=1e-5)

    # no-rerank chunked IP: exact top-k must also match
    kw2 = dict(topk=7, mode="ip", query_batch=4)
    plain2 = Searcher(DeviceIndex.from_packed(packed, layout="row"),
                      SearchConfig(**kw2, row_chunk=-1))
    chunk2 = Searcher(DeviceIndex.from_packed(packed, layout="row"),
                      SearchConfig(**kw2, row_chunk=32))
    s2p, r2p = plain2.search(qv, qi)
    s2c, r2c = chunk2.search(qv, qi)
    np.testing.assert_array_equal(r2p, r2c)
    np.testing.assert_allclose(s2p, s2c, rtol=1e-5, atol=1e-5)

    # prime row count: chunking must still engage (tail slice) and match
    packed_p = PackedIndex(values[:97], indices[:97],
                           docids[:97], lex_dim=lex)
    plain_p = Searcher(DeviceIndex.from_packed(packed_p, layout="row"),
                       SearchConfig(**kw2, row_chunk=-1))
    chunk_p = Searcher(DeviceIndex.from_packed(packed_p, layout="row"),
                       SearchConfig(**kw2, row_chunk=32))
    spp, rpp = plain_p.search(qv, qi)
    spc, rpc = chunk_p.search(qv, qi)
    np.testing.assert_array_equal(rpp, rpc)
    np.testing.assert_allclose(spp, spc, rtol=1e-5, atol=1e-5)

    # 512-alignment branch: chunk >= 1024 rows aligns down to a multiple
    # of 512, growing the tail — rankings must still match exactly
    N4 = 5000
    values4 = (rng.random((N4, D)) + 0.05).astype(np.float16)
    indices4 = rng.integers(0, 5, (N4, lex)).astype(np.uint8)
    docids4 = np.asarray([f"d{i}" for i in range(N4)], dtype=object)
    packed4 = PackedIndex(values4, indices4, docids4, lex_dim=lex)
    from dhr_tpu.retrieval.searcher import _row_chunk_split
    chunk4, main4 = _row_chunk_split(N4, 2)
    assert chunk4 == 2048 and main4 == 4096  # tail = 904 rows
    plain4 = Searcher(DeviceIndex.from_packed(packed4, layout="row"),
                      SearchConfig(**kw2, row_chunk=-1))
    chunk_s4 = Searcher(DeviceIndex.from_packed(packed4, layout="row"),
                        SearchConfig(**kw2, row_chunk=2500))
    s4p, r4p = plain4.search(qv, qi)
    s4c, r4c = chunk_s4.search(qv, qi)
    np.testing.assert_array_equal(r4p, r4c)
    np.testing.assert_allclose(s4p, s4c, rtol=1e-5, atol=1e-5)

    # chunk-order regression: pool width == k_local (J*k_pc == topk with
    # approximate candidates) must still come back globally score-sorted.
    # (Chunked vs unchunked approximate POOLS legitimately differ at
    # zero-slack settings, so only the ordering contract is asserted.)
    kw3 = dict(topk=8, mode="ip", rerank=True, agip_topk=8, query_batch=4,
               approx_candidates=True)
    chunk3 = Searcher(DeviceIndex.from_packed(packed, layout="row"),
                      SearchConfig(**kw3, row_chunk=64))
    s3c, _ = chunk3.search(qv, qi)
    assert np.all(np.diff(np.asarray(s3c), axis=-1) <= 1e-6)
