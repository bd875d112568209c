"""Pallas partial-GIP kernel vs the jnp reference path (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhr_tpu.ops.pallas_gip import partial_gip_scores_pallas
from dhr_tpu.retrieval.searcher import _partial_gip_scores


@pytest.mark.parametrize("unroll", [1, 4, 8])
@pytest.mark.parametrize("lex,cls,k", [(16, 4, 5), (8, 0, 3)])
def test_pallas_kernel_matches_jnp(rng, lex, cls, k, unroll):
    B, N, I = 4, 256, 6
    D = lex + cls
    values_T = jnp.asarray(rng.random((D, N)), jnp.float32)
    indices_T = jnp.asarray(rng.integers(0, k, (lex, N)), jnp.int8)
    qv = jnp.asarray(
        np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0), jnp.float32
    )
    qi = jnp.asarray(
        np.concatenate(
            [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
        ), jnp.int32,
    )
    want = np.asarray(_partial_gip_scores(qv, qi, values_T, indices_T, lex, I))
    got = np.asarray(
        partial_gip_scores_pallas(
            qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True,
            unroll=unroll,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_kernel_brute_force_equals_masked_gip(rng):
    """I == D with theta=0 must equal exact GIP + CLS inner product."""
    from dhr_tpu.ops import gip_scores_masked, pad_indices_for_cls

    B, N, lex, cls, k = 3, 128, 8, 2, 4
    D = lex + cls
    pv = rng.random((N, D)).astype(np.float32)
    pi = rng.integers(0, k, (N, lex)).astype(np.int8)
    qv = rng.random((B, D)).astype(np.float32)
    qi = rng.integers(0, k, (B, lex)).astype(np.int32)
    qi_full = np.asarray(pad_indices_for_cls(jnp.asarray(qi), cls))
    pi_full = np.asarray(pad_indices_for_cls(jnp.asarray(pi.astype(np.int32)), cls))
    want = np.asarray(
        gip_scores_masked(
            jnp.asarray(qv), jnp.asarray(qi_full),
            jnp.asarray(pv), jnp.asarray(pi_full),
        )
    )
    got = np.asarray(
        partial_gip_scores_pallas(
            jnp.asarray(qv), jnp.asarray(qi_full),
            jnp.asarray(pv.T.copy()), jnp.asarray(pi.T.copy()),
            lex, D, n_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_kernel_bf16_out_close_to_f32(rng):
    """candidate_bf16 mode: f32 scratch accumulation, bf16 only on the final
    write — values match the f32 kernel within bf16 rounding."""
    B, N, I, lex, cls, k = 4, 512, 12, 16, 4, 5
    D = lex + cls
    values_T = jnp.asarray(rng.random((D, N)), jnp.float32)
    indices_T = jnp.asarray(rng.integers(0, k, (lex, N)), jnp.int8)
    qv = jnp.asarray(
        np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0),
        jnp.float32,
    )
    qi = jnp.asarray(
        np.concatenate(
            [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
        ), jnp.int32,
    )
    f32 = partial_gip_scores_pallas(
        qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True)
    b16 = partial_gip_scores_pallas(
        qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True,
        out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b16, np.float32), np.asarray(f32), rtol=8e-3, atol=8e-3)


@pytest.mark.parametrize("G", [2, 4])
def test_fused_candidates_kernel_matches_block_reduce(rng, G):
    """Fused kernel == np block-max/argmax of the reference score plane,
    with first-max tie semantics and exact absolute row ids."""
    from dhr_tpu.ops.pallas_gip import partial_gip_candidates_pallas

    B, N, I, lex, cls, k = 4, 1024, 6, 16, 4, 5
    D = lex + cls
    n_tile, LANE = 512, 128
    ts, n_tiles = n_tile // LANE, N // n_tile
    values_T = np.round(rng.random((D, N)) * 8) / 8  # force ties
    indices_T = rng.integers(0, k, (lex, N)).astype(np.int8)
    qv = np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0)
    qi = np.concatenate(
        [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
    ).astype(np.int32)
    args = (jnp.asarray(qv, jnp.float32), jnp.asarray(qi),
            jnp.asarray(values_T, jnp.float32), jnp.asarray(indices_T))
    want = np.asarray(_partial_gip_scores(*args, lex, I))
    rv, rr = partial_gip_candidates_pallas(
        *args, lex, I, n_tile=n_tile, interpret=True, unroll=4,
        out_dtype=jnp.float32, reduce_block=G)
    s5 = want.reshape(B, n_tiles, ts // G, G, LANE)
    red_want = s5.max(axis=3).reshape(B, -1)
    arg = s5.argmax(axis=3)  # first max on ties, like the kernel
    tile = np.arange(n_tiles)[None, :, None, None]
    g = np.arange(ts // G)[None, None, :, None]
    lane = np.arange(LANE)[None, None, None, :]
    rows_want = (tile * n_tile + (g * G + arg) * LANE + lane).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(rv), red_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rr), rows_want)


@pytest.mark.parametrize("G", [2, 8])
def test_fused_candidates_packed_ids_match_two_plane(rng, G):
    """packed_ids variant: one f32 plane with the winner's local index in
    the low mantissa bits.  Decoded rows must equal the two-plane variant's
    exactly; decoded scores within G ulps (id bits cleared).  Negative
    scores included (negative qv) — packing perturbs only low mantissa
    bits, so float ordering survives either sign."""
    from dhr_tpu.ops.pallas_gip import (
        decode_packed_candidates, partial_gip_candidates_pallas,
    )

    B, N, I, lex, cls, k = 4, 1024, 6, 16, 4, 5
    D = lex + cls
    values_T = np.round(rng.random((D, N)) * 8) / 8
    indices_T = rng.integers(0, k, (lex, N)).astype(np.int8)
    qv = np.where(rng.random((B, D)) > 0.5,
                  rng.random((B, D)) - 0.5, 0.0)  # signed -> signed scores
    qi = np.concatenate(
        [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
    ).astype(np.int32)
    args = (jnp.asarray(qv, jnp.float32), jnp.asarray(qi),
            jnp.asarray(values_T, jnp.float32), jnp.asarray(indices_T))
    n_tile = 128 * G  # must be a multiple of G * LANE
    rv, rr = partial_gip_candidates_pallas(
        *args, lex, I, n_tile=n_tile, interpret=True, unroll=4,
        out_dtype=jnp.float32, reduce_block=G)
    packed = partial_gip_candidates_pallas(
        *args, lex, I, n_tile=n_tile, interpret=True, unroll=4,
        reduce_block=G, packed_ids=True)
    assert packed.shape == rv.shape and packed.dtype == jnp.float32
    pos = jnp.broadcast_to(jnp.arange(packed.shape[-1]), packed.shape)
    scores, rows = decode_packed_candidates(packed, pos, G)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(rr))
    # id bits live below f32 precision at these magnitudes except exact 0
    want = np.asarray(rv)
    got = np.asarray(scores)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-37)
    # the packed plane itself orders like the scores wherever they differ
    # by more than G ulps (spot-check via argsort agreement on row 0)
    order_p = np.argsort(-np.asarray(packed)[0], kind="stable")
    order_s = np.argsort(-want[0], kind="stable")
    disagree = order_p != order_s
    if disagree.any():
        assert np.allclose(want[0][order_p[disagree]],
                           want[0][order_s[disagree]], rtol=1e-6)


def test_searcher_fused_candidates_matches_plain(rng):
    """End-to-end: fused-candidate search == plain search (same final
    rankings) when the candidate pool covers the corpus."""
    from dhr_tpu.retrieval import DeviceIndex, PackedIndex, SearchConfig, Searcher

    N, lex, cls = 1024, 24, 8
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 6, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    qv = values[:8].astype(np.float32)
    qi = indices[:8].astype(np.int32)

    common = dict(topk=10, mode="gip", theta=0.1, rerank=True,
                  agip_topk=512, query_batch=8, use_pallas=True,
                  pallas_interpret=True, pallas_n_tile=256,
                  approx_candidates=False)
    plain = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(fused_candidates=False, **common))
    fused = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(fused_candidates=True, candidate_block=2,
                                  **common))
    sp, rp = plain.search(qv, qi)
    sf, rf = fused.search(qv, qi)
    # the 512-candidate pool (of 512 block winners) plus exact rerank makes
    # missing a true top-10 row require it to lose its block to a better
    # row AND that block's winner to rank below 512 — assert exact equality
    # on this seeded fixture
    np.testing.assert_array_equal(rp[:, :10], rf[:, :10])
    np.testing.assert_allclose(sp[:, :10], sf[:, :10], rtol=1e-5, atol=1e-5)


def test_searcher_fused_candidates_stratified(rng):
    """Fused packed-id candidates + stratified per-slice selection: the
    positions returned by _stratified_approx are plane positions (slice
    offset added back), so the packed decode must map them to the same rows
    as the exact-selection path when the pool covers the corpus."""
    from dhr_tpu.retrieval import (
        DeviceIndex, PackedIndex, SearchConfig, Searcher,
    )

    N, lex, cls = 4096, 24, 8
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 6, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    qv = values[:8].astype(np.float32)
    qi = indices[:8].astype(np.int32)

    common = dict(topk=10, mode="gip", theta=0.1, rerank=True,
                  agip_topk=256, query_batch=8, use_pallas=True,
                  pallas_interpret=True, pallas_n_tile=512,
                  fused_candidates=True, candidate_block=2)
    exact = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(approx_candidates=False, **common))
    strat = Searcher(DeviceIndex.from_packed(packed),
                     SearchConfig(approx_candidates=True,
                                  candidate_recall=0.99,
                                  candidate_slices=4, **common))
    se, re_ = exact.search(qv, qi)
    ss, rs = strat.search(qv, qi)
    # 256 candidates of 2048 block winners at recall .99 x exact rerank:
    # top-10 should agree on this seeded fixture
    np.testing.assert_array_equal(re_[:, :10], rs[:, :10])
    np.testing.assert_allclose(se[:, :10], ss[:, :10], rtol=1e-5, atol=1e-5)


def test_searcher_fused_candidates_sharded_mesh(rng, eight_devices):
    """Fused packed-id candidates on an 8-way index mesh == unsharded.

    Exercises the shard-offset arithmetic after the packed decode (each
    shard's winners decode to shard-local rows, then ``rows + offset``)
    and the per-shard-topk -> all_gather -> global-topk merge."""
    from dhr_tpu.parallel import make_mesh
    from dhr_tpu.retrieval import (
        DeviceIndex, PackedIndex, SearchConfig, Searcher,
    )

    N, lex, cls = 2048, 24, 8
    D = lex + cls
    values = (rng.random((N, D)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 6, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex)
    qv = values[:8].astype(np.float32)
    qi = indices[:8].astype(np.int32)

    cfg = SearchConfig(topk=10, mode="gip", theta=0.1, rerank=True,
                       agip_topk=128, query_batch=8, use_pallas=True,
                       pallas_interpret=True, pallas_n_tile=256,
                       approx_candidates=False,
                       fused_candidates=True, candidate_block=2)
    single = Searcher(DeviceIndex.from_packed(packed), cfg)
    mesh = make_mesh(eight_devices, axis="index")
    sharded = Searcher(DeviceIndex.from_packed(packed, mesh=mesh), cfg)
    ss, rs = single.search(qv, qi)
    sm, rm = sharded.search(qv, qi)
    np.testing.assert_array_equal(rs[:, :10], rm[:, :10])
    np.testing.assert_allclose(ss[:, :10], sm[:, :10], rtol=1e-5, atol=1e-5)


def test_query_chunk_arithmetic():
    """Chunk size divides B and keeps B_chunk * I * 12 under the budget."""
    from dhr_tpu.ops import pallas_gip as pg

    budget = pg._SMEM_PREFETCH_BUDGET
    # the observed failure point: B=128, I=896 (brute-force over 896 dims)
    bc = pg._query_chunk(128, 896)
    assert 128 % bc == 0 and bc < 128
    assert bc * 896 * 12 <= budget
    # bench point fits un-chunked: B=128, I=48
    assert pg._query_chunk(128, 48) == 128
    # degenerate: even one query over the budget still returns >= 1
    assert pg._query_chunk(1, budget) == 1


def test_pallas_kernel_chunked_queries_match_unchunked(rng, monkeypatch):
    """A tiny SMEM budget forces query chunking; scores must be identical
    to the jnp reference (and hence to the unchunked kernel)."""
    from dhr_tpu.ops import pallas_gip as pg

    B, N, I, lex, cls, k = 6, 384, 7, 16, 4, 5
    D = lex + cls
    values_T = jnp.asarray(rng.random((D, N)), jnp.float32)
    indices_T = jnp.asarray(rng.integers(0, k, (lex, N)), jnp.int8)
    qv = jnp.asarray(
        np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0),
        jnp.float32)
    qi = jnp.asarray(np.concatenate(
        [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1), jnp.int32)
    want = np.asarray(_partial_gip_scores(qv, qi, values_T, indices_T, lex, I))
    # padded I=8 -> 96 B/query; budget 200 -> chunk of 2 queries
    monkeypatch.setattr(pg, "_SMEM_PREFETCH_BUDGET", 200)
    pg.pallas_partial_gip.clear_cache()  # drop any unchunked cached trace
    assert pg._query_chunk(B, 8) == 2
    got = np.asarray(partial_gip_scores_pallas(
        qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True,
        unroll=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("packed", [False, True])
def test_fused_candidates_chunked_queries_match_unchunked(
        rng, monkeypatch, packed):
    """Query chunking in the fused-candidates kernel: both output variants
    must equal the unchunked run exactly."""
    from dhr_tpu.ops import pallas_gip as pg
    from dhr_tpu.ops.pallas_gip import partial_gip_candidates_pallas

    B, N, I, lex, cls, k, G = 6, 768, 7, 16, 4, 5, 2
    D = lex + cls
    values_T = np.round(rng.random((D, N)) * 8) / 8
    indices_T = rng.integers(0, k, (lex, N)).astype(np.int8)
    qv = np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0)
    qi = np.concatenate(
        [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
    ).astype(np.int32)
    args = (jnp.asarray(qv, jnp.float32), jnp.asarray(qi),
            jnp.asarray(values_T, jnp.float32), jnp.asarray(indices_T))
    kw = dict(n_tile=256, interpret=True, unroll=4, reduce_block=G,
              out_dtype=jnp.float32, packed_ids=packed)
    ref = partial_gip_candidates_pallas(*args, lex, I, **kw)
    monkeypatch.setattr(pg, "_SMEM_PREFETCH_BUDGET", 200)
    pg.pallas_gip_candidates.clear_cache()  # force a re-trace under the
    assert pg._query_chunk(B, 8) == 2       # patched budget
    got = partial_gip_candidates_pallas(*args, lex, I, **kw)
    if packed:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    else:
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
