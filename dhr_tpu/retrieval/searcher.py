"""The GIP/IP search engine over a mesh-sharded index.

Semantics parity with the reference's scoring engine
(retrieval/gip_retrieval.py:60-231) under a different, TPU-shaped execution
plan:

===========================  ==============================================
reference (torch GPU)         dhr_tpu (XLA/TPU)
===========================  ==============================================
per-query python loop         fixed-size query batches, one compiled program
column gather of important    dim-major planes: each important dim is one
dims from row-major arrays     contiguous (N,)-row DMA, streamed by lax.scan
(qi==pi)*pv elementwise x d   same gate fused into the scan accumulate
torch.topk over full shard    blockwise top-k (per 16k block, then merge)
process-per-shard + TREC      shard_map over the mesh ``index`` axis:
merge scripts                  local top-k -> all_gather -> global top-k
faiss PQ int8 candidates      per-dim int8 value planes, scales folded into
                               the query (bf16 x int8 stays in HBM as int8)
===========================  ==============================================

Mode map (gip_retrieval.py flags -> SearchConfig):
- ``--brute_force``            -> mode="gip", theta=0
- ``--theta t``                -> mode="gip", theta=t  (thresholded full-dim
                                   GIP == the reference's important-dims
                                   gather, gip_retrieval.py:130-136)
- ``--IP``                     -> mode="ip" (candidate gen by inner product)
- ``--rerank --agip_topk K``   -> rerank=True, agip_topk=K; the rerank uses
                                   the *unthresholded* query like the
                                   reference (gip_retrieval.py:144-148)
- ``--lamda``                  -> lam, query CLS tail scaling at load
                                   (gip_retrieval.py:281-283)
- ``--PQIP``                   -> mode="pq": ADC scoring of PQ codes for
                                   candidates + exact GIP rerank, matching
                                   faiss IndexPQ(m, 8, IP) bytes/row
                                   (PQ_IP_retrieval, gip_retrieval.py:167-231)

Compression options are distinct budgets, not interchangeable: per-dim int8
value planes cost 1 B/dim (896 B/row here, an ~8x cut vs f16+u8 planes at
search time), while PQ codes cost m B/row (64 B/row at m=64 — the
reference's quantize_index.py budget).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dhr_tpu.ops.topk import blockwise_topk, merge_topk
from dhr_tpu.retrieval.index import DeviceIndex

INDEX_AXIS = "index"


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    topk: int = 1000
    mode: str = "gip"            # 'gip' | 'ip' | 'pq' (ADC candidates)
    theta: float = 0.0           # 0 => brute force GIP
    rerank: bool = False
    agip_topk: int = 10000
    lam: float = 1.0             # query CLS weight
    max_important_dims: int = 128  # theta-pass scan length (static)
    query_batch: int = 64
    topk_block: int = 16384
    # Pallas streaming kernel for the theta pass: True / False / "auto"
    # (auto = on TPU backends when the shard row count tiles evenly).
    use_pallas: bool | str = "auto"
    # None = pick the largest even tile that fits VMEM; big tiles amortize
    # per-step DMA latency (measured: 4096 -> 270 q/s, 102400 -> 5293 q/s
    # at 205k rows).
    pallas_n_tile: int | None = None
    # important dims streamed per kernel grid step; >1 puts more DMA
    # streams in flight (one stream sustains only ~31 GB/s on v5e at
    # 100-200 KB tiles, so aggregate bandwidth scales with stream count).
    pallas_unroll: int = 8
    # Candidate top-k via the TPU-native approximate PartialReduce when an
    # exact rerank follows (lax.approx_max_k); the final result top-k is
    # always exact.  Irrelevant to metrics at recall 0.99 over 10k candidates.
    pallas_interpret: bool = False  # CPU-testing escape hatch
    approx_candidates: bool = True
    # recall target over the agip_topk candidate pool; the exact rerank that
    # follows makes the effective recall@topk ~1 (borderline candidates are
    # the ones dropped).  0.99 costs 6.5x more than 0.95 on v5e.
    candidate_recall: float = 0.95
    # bf16 candidate scores from the Pallas theta pass when an exact rerank
    # follows: halves the (B, N) score write (measured 33.8 -> 31.6 ms per
    # 64-query batch on v5e; the kernel still accumulates in f32 scratch).
    # Only used with rerank=True — final scores always come from the exact
    # f32 rerank.
    candidate_bf16: bool = True
    # Stratified candidate selection (rerank path): slice the score plane
    # into candidate_slices column bands and approx-top-(k/S) each band
    # instead of one global approx-top-k.  approx_max_k is k-bound, not
    # N-bound (measured 17.4 ms at BOTH 1.64M and 205k lanes, k=10k), so
    # smaller per-slice k is cheaper while per-slice coverage leaves pool
    # recall equal or better (0.99783 at S=16 vs 0.99767 global).  In the
    # fused stage-1+rerank program S=16 measures fastest (57.7 vs 66.3
    # ms/64-query batch interleaved A/B on v5e; S=32 oddly loses its
    # isolated-program edge when fused).  Slice edges only perturb ranks
    # near k, which the exact rerank re-scores anyway.  "auto" = 16 when
    # shapes allow; 1 disables.  Only with rerank (the pool is unordered).
    candidate_slices: int | str = "auto"
    # Fused candidate selection: the theta-pass kernel reduces each
    # candidate_block-row group to its (max score, argmax row) in VMEM (VPU
    # work hidden behind the kernel's DMA streams) so the candidate top-k
    # runs over an N/candidate_block plane and the full (B, N) score plane
    # is never written.  The TPU analog of the reference's fused score+topk
    # (gip_retrieval.py:142).  Only with rerank (a group's runner-up rows
    # are unranked); "auto" = on when the reduced pool comfortably covers
    # the candidate count.  Default OFF: measured on v5e the kernel itself
    # is faster (29.2 vs 31.1 ms) but resolving winner row ids costs a
    # 9.3 ms lane-gather, so plain + stratified selection wins e2e
    # (design.md round-3 notes).
    fused_candidates: bool | str = False
    candidate_block: int = 8
    # Two-tier candidate escalation (rerank path): tier 1 searches with a
    # SMALL candidate pool (``escalate_pool`` rows, e.g. 2000 instead of
    # agip_topk=10000) — the candidate top-k is k-bound and the rerank
    # gather is pool-proportional, so the small pool cuts the two stages
    # that dominate the batch.  Queries whose reranked ``topk``-th score
    # lands within ``escalate_margin`` of the tier-1 pool's stage-1 floor
    # (the smallest stage-1 score admitted to the pool — rows outside the
    # pool score below it, so a tail that close may be cut off) are
    # re-dispatched once at the full ``agip_topk``.  The TPU-shaped analog
    # of adaptive-nprobe tricks: most queries pay the small pool, the few
    # ambiguous ones pay the reference-equivalent full pool.  0 disables.
    escalate_pool: int = 0
    # Escalate when (topk-th reranked score) - (stage-1 pool floor) <= this.
    # The rerank adds the non-scanned query dims' contribution, so the gap
    # is usually positive; larger margins escalate more queries (higher
    # recall floor), smaller escalate fewer.  Calibrate against a measured
    # recall-vs-pool distribution for the corpus (see docs/design.md).
    escalate_margin: float = 0.0
    # Row-chunked stage 1 for the row-major IP path (layout="row", the
    # reference's --IP candidates + GIP-rerank operating point at corpus
    # scales where the dim-major planes do not fit: 8.8M rows x 1664 B =
    # 14.6 GB leaves no HBM for a (B, N) score plane or the int8->bf16
    # matmul operand copy).  lax.map over row chunks keeps both transients
    # chunk-sized; per-chunk candidate top-(k/J) then a global merge — the
    # chunk-level twin of stratified candidate selection.  0 = auto (chunk
    # above ~2M rows), -1 = off, >0 = target rows per chunk (rounded to a
    # divisor of the shard row count).
    row_chunk: int = 0


_PALLAS_TILES = (819200, 409600, 262144, 204800, 131072, 102400, 65536, 51200, 32768,
                 25600, 16384, 8192, 4096)
_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the ~16 MB scoped limit


def _pick_pallas_tile(
    n_shard: int, value_bytes: int = 2, unroll: int = 8,
    narrow_out: bool = False, fused_block: int = 0,
) -> int | None:
    """Largest tile that divides the shard AND fits the kernel in VMEM.

    VMEM per tile = f32 accumulator (+ a separate bf16 out block when
    ``narrow_out``, or the 1/``fused_block``-sized reduced out planes in
    fused-candidates mode) + ``unroll`` double-buffered value/index tile
    pairs; exceeding the ~16 MB scoped limit is a compile error (measured:
    bf16 U=4 at n_tile=409600 fails with 16.23M > 16M).
    """
    if fused_block:
        if fused_block & (fused_block - 1) == 0:
            # packed-ids variant: f32 acc + one f32 out plane / G
            out_bytes = 4 + -(-4 // fused_block)
        else:
            out_bytes = 4 + -(-6 // fused_block)  # acc + (bf16+i32)/G outs
    else:
        out_bytes = 6 if narrow_out else 4
    for t in _PALLAS_TILES:
        if t > n_shard or n_shard % t:
            continue
        if fused_block:
            # the reduced out block is (1, t/(128*G), 128): Mosaic requires
            # the second-to-last block dim to be a multiple of 8 OR equal
            # to the full reduced dim (single-tile shard).  G=16 at tile
            # 204800 gives 100 — legal-looking but an AOT compile error.
            if t % (128 * fused_block):
                continue
            nrb = t // (128 * fused_block)
            if nrb % 8 and t != n_shard:
                continue
        vmem = t * out_bytes + unroll * 2 * t * (value_bytes + 1)
        if vmem <= _VMEM_BUDGET:
            return t
    return None


def _pick_row_chunks(row_chunk: int, n_rows: int) -> int:
    """Chunk count J for the row-major IP stage-1 scan (SearchConfig.row_chunk).

    Auto mode chunks only above ~2M rows (below that the (B, N) scores and
    the bf16 operand copy fit comfortably) targeting <=512k rows per chunk.
    J = ceil(n_rows / target): the main body is J equal chunks of
    n_rows // J rows (aligned down to a multiple of 512 when large) scanned
    under lax.map, and the remainder is scored as one separate tail slice —
    so ANY row count chunks (MS MARCO's 8,841,823 is prime; a divisor-based
    scheme would silently fall back to the unchunked path and OOM at the
    exact scale chunking exists for)."""
    if row_chunk < 0 or n_rows <= 0:
        return 1
    if row_chunk == 0:
        if n_rows <= (1 << 21):
            return 1
        target = 512 * 1024
    else:
        target = row_chunk
    if n_rows <= target:
        return 1
    return -(-n_rows // target)


def _row_chunk_split(n_rows: int, J: int) -> tuple[int, int]:
    """(chunk, main): J*chunk rows scan under lax.map, n_rows-main is the
    tail.  Chunks align down to 512 rows (lane-friendly) when large."""
    chunk = n_rows // J
    if chunk >= 1024:
        chunk -= chunk % 512
    return chunk, J * chunk


def _pick_slices(candidate_slices, n_lanes: int, k_local: int) -> int:
    """Resolve the stratified-selection slice count for a score plane.

    "auto" stays at 1 unless the pool is a small fraction of the plane
    (n >= 8k): at high pool fractions the per-slice counts of true top-k
    members vary enough that slice edges visibly change the pool (measured:
    486/1600 rank rows moved at k/n = 25% on the parity fixture), while at
    bench scale (k/n ~ 0.6%) the pool recall is equal-or-better.  An
    explicit slice count skips that guard.  Then halve until each slice
    keeps >= 64 candidates and divides the lane count.
    """
    if candidate_slices == "auto":
        s = 16 if n_lanes >= 8 * k_local else 1
    else:
        s = int(candidate_slices)
    while s > 1 and (
        k_local // s < 64
        or n_lanes % s
        or (n_lanes // s) <= 2 * (k_local // s)
    ):
        s //= 2
    return max(s, 1)


def _stratified_approx(scores, k_local: int, S: int, recall: float):
    """Per-slice approx-top-(k/S): (vals, positions) into the full plane."""
    Bq, n_lanes = scores.shape
    w = n_lanes // S
    ks = k_local // S
    sliced = scores.reshape(Bq * S, w)
    vals, pos = jax.lax.approx_max_k(sliced, ks, recall_target=recall)
    off = (jnp.arange(Bq * S, dtype=pos.dtype) % S * w)[:, None]
    return vals.reshape(Bq, S * ks), (pos + off).reshape(Bq, S * ks)


# --------------------------------------------------------------------------
# device-side kernels
# --------------------------------------------------------------------------


def _partial_gip_scores(qv, qi, values_T, indices_T, lex_dim, n_dims):
    """Streamed partial GIP: scan over each query's top ``n_dims`` dims.

    qv: (B, D) f32 — theta-thresholded, CLS- and int8-scale-folded.
    qi: (B, D) i32 — index plane padded with 1 over CLS dims.
    values_T: (D, N) dim-major, indices_T: (lex_dim, N) dim-major.
    Returns (B, N) f32.  Each scan step DMAs one contiguous (N,) dim row per
    query — the bandwidth-optimal access the reference's column gather can't
    achieve on a row-major array.
    """
    imp_val, imp_dim = jax.lax.top_k(qv, n_dims)  # (B, I)
    imp_gate = jnp.take_along_axis(qi, imp_dim, axis=-1)  # (B, I)
    n_rows = values_T.shape[1]

    def per_step(carry, args):
        vals, dims, gates = args  # (B,) each
        row_v = values_T[dims]                       # (B, N) row gather
        safe = jnp.minimum(dims, lex_dim - 1)
        row_i = indices_T[safe]                      # (B, N)
        gate = jnp.where(
            (dims < lex_dim)[:, None], row_i == gates[:, None], True
        )
        contrib = jnp.where(gate, row_v.astype(jnp.float32), 0.0)
        return carry + contrib * vals[:, None], None

    init = jnp.zeros((qv.shape[0], n_rows), jnp.float32)
    scores, _ = jax.lax.scan(per_step, init, (imp_val.T, imp_dim.T, imp_gate.T))
    return scores


def _partial_ip_scores(qv, values_T):
    """(B, D) x (D, N) -> (B, N): one MXU matmul (IP approximation mode).

    bf16 operands by default (the MXU-native width); f32 planes
    (``--value-dtype f32``, the exact-parity escape hatch) keep the matmul
    in f32 so scores match a float64 oracle to f32 rounding.
    """
    if values_T.dtype == jnp.float32:
        # precision="highest": DEFAULT lowers even f32 operands to
        # bf16-class passes (measured 3.6e-4 rel error vs 1.6e-7)
        return jnp.dot(
            qv.astype(jnp.float32), values_T, precision="highest",
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        qv.astype(jnp.bfloat16), values_T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _partial_ip_scores_rowmajor(qv, values):
    """(B, D) x (N, D) -> (B, N): the row-major-only (layout="row") twin.

    The MXU contracts either operand orientation; keeping the corpus
    row-major lets ip/pq+rerank configs keep ONE plane copy in HBM.
    """
    dn = (((1,), (1,)), ((), ()))
    if values.dtype == jnp.float32:
        return jax.lax.dot_general(
            qv.astype(jnp.float32), values, dn, precision="highest",
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        qv.astype(jnp.bfloat16), values.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32,
    )


def _rerank_gip(qv, qi, cand_values, cand_indices, lex_dim):
    """Exact GIP over gathered candidates: (B, D) vs (B, K, D) -> (B, K).

    Products stay in the value dtype and only the reduction accumulates in
    f32, so no (B, K, D) f32 copy is ever materialized.
    """
    gate = cand_indices == qi[:, None, :lex_dim].astype(cand_indices.dtype)
    # bf16 x f32 promotes elementwise to f32 (fused convert), no (B, K, D)
    # f32 copy is materialized
    lex_prod = cand_values[..., :lex_dim] * qv[:, None, :lex_dim]
    lex = jnp.sum(jnp.where(gate, lex_prod, 0.0), axis=-1, dtype=jnp.float32)
    cls = jnp.sum(
        cand_values[..., lex_dim:] * qv[:, None, lex_dim:],
        axis=-1, dtype=jnp.float32,
    )
    return lex + cls


# --------------------------------------------------------------------------
# searcher
# --------------------------------------------------------------------------


class Searcher:
    """Batched searcher over a :class:`DeviceIndex`.

    Two jitted programs: (1) partial scores + per-shard top-k + cross-shard
    merge under ``shard_map``; (2) optional exact-GIP rerank over gathered
    candidates (XLA lowers the cross-shard row gather itself).
    """

    def __init__(self, index: DeviceIndex, config: SearchConfig):
        self.index = index
        self.config = config
        self.mesh = index.mesh
        self._has_gip = index.indices_T is not None and config.mode == "gip"
        if config.mode == "pq" and index.pq_codes is None:
            raise ValueError(
                "mode='pq' needs a PQ-quantized index (PackedIndex."
                "quantize_pq / 'index --pq-m')"
            )
        if (config.mode == "gip" and index.indices_T is None
                and index.indices is not None):
            raise ValueError(
                "mode='gip' needs the dim-major planes but the index was "
                "built layout='row'; rebuild with layout='both' (or use "
                "mode='ip'/'pq' candidates, which score row-major)"
            )
        if config.rerank and index.values is None:
            raise ValueError(
                "rerank needs the row-major planes but the index was built "
                "layout='dim'; rebuild with layout='both' or disable rerank"
            )
        if config.escalate_pool:
            if not config.rerank:
                raise ValueError("escalate_pool needs rerank=True (the "
                                 "trigger compares reranked scores to the "
                                 "stage-1 pool floor)")
            if index.indices is None:
                raise ValueError(
                    "escalate_pool needs an index with lexical index "
                    "planes: a dense (indices=None) index has no rerank "
                    "stage, so there is no tier-2 to escalate to"
                )
            if not (config.topk <= config.escalate_pool < config.agip_topk):
                raise ValueError(
                    f"escalate_pool={config.escalate_pool} must lie in "
                    f"[topk={config.topk}, agip_topk={config.agip_topk})"
                )
            # tier 2: the reference-equivalent full-pool searcher escalated
            # queries re-dispatch through (shares the device index planes;
            # only the compiled programs are per-tier)
            self._tier2 = Searcher(
                index, dataclasses.replace(config, escalate_pool=0)
            )
        else:
            self._tier2 = None
        self.escalated_queries = 0  # cumulative, for /stats introspection
        self.last_timing = None  # per-run wall decomposition (see search())
        self._stage1 = self._build_stage1()
        self._stage2 = self._build_stage2()
        self._prep = self._build_prep()
        self._run_batch = self._build_run_batch()

    def _build_stage1(self):
        cfg, idx = self.config, self.index
        has_gip = self._has_gip
        n_total = (
            idx.values_T.shape[1] if idx.values_T is not None
            else idx.values.shape[0]
        )
        pool = cfg.escalate_pool or cfg.agip_topk
        k1 = min(pool if cfg.rerank else cfg.topk, n_total)
        n_dims = (
            idx.dim if cfg.theta == 0.0 else min(cfg.max_important_dims, idx.dim)
        )

        shard_axes = getattr(idx, "shard_axes", (INDEX_AXIS,))
        n_mesh_dev = 1
        if self.mesh is not None:
            for a in shard_axes:
                n_mesh_dev *= self.mesh.shape[a]
        n_shard = n_total // n_mesh_dev
        value_bytes = (
            idx.values_T.dtype.itemsize if idx.values_T is not None else 2
        )
        cand_dtype = (
            jnp.bfloat16 if cfg.rerank and cfg.candidate_bf16
            else jnp.float32
        )
        G = cfg.candidate_block
        want_fused = (
            cfg.fused_candidates in (True, "auto")
            and cfg.rerank and has_gip and G > 1
            # "auto" respects exact-candidates (approx_candidates=False
            # promises candidate recall 1.0, which block reduction breaks);
            # an explicit True overrides
            and (cfg.approx_candidates or cfg.fused_candidates is True)
            # the reduced pool must comfortably cover the candidate count
            # (every candidate is a distinct block winner)
            and n_shard // G >= (k1 if cfg.fused_candidates is True
                                 else 2 * k1)
        )
        pallas_tile = cfg.pallas_n_tile or _pick_pallas_tile(
            n_shard, value_bytes, cfg.pallas_unroll,
            narrow_out=cand_dtype != jnp.float32,
            fused_block=G if want_fused else 0,
        )
        pallas_ok = (
            has_gip
            and cfg.use_pallas in (True, "auto")
            and pallas_tile is not None
            and n_shard % pallas_tile == 0
            and (cfg.use_pallas is True
                 or jax.default_backend() in ("tpu", "axon"))
        )
        fused_ok = (
            want_fused and pallas_ok
            and (pallas_tile // 128) % G == 0
            # Mosaic out-block rule (see _pick_pallas_tile); re-checked
            # here because pallas_n_tile can be set explicitly.  Interpret
            # mode has no Mosaic lowering, so tests with tiny tiles pass.
            and (cfg.pallas_interpret
                 or (pallas_tile % (128 * G) == 0
                     and ((pallas_tile // (128 * G)) % 8 == 0
                          or pallas_tile == n_shard)))
        )

        def local(qv, qi, arrs, offset, n_local):
            if cfg.mode == "pq":
                # ADC candidate generation over the PQ codes — the
                # reference's faiss-PQ search stage (gip_retrieval.py:177-188)
                from dhr_tpu.ops.pq import pq_ip_scores, pq_luts

                luts = pq_luts(qv, idx.pq_centroids)
                scores = pq_ip_scores(luts, arrs[0])
            elif has_gip:
                values_T, indices_T = arrs
                if fused_ok:
                    # fused path: the kernel emits (N/G) block winners;
                    # candidate top-k runs over the reduced plane and the
                    # winners ARE the candidate rows.  Power-of-two G uses
                    # packed ids (winner's local index in the score's low
                    # mantissa bits) so the row id is arithmetic of the
                    # top-k position — no take_along_axis gather (measured
                    # 9.3 ms for (64, 10k) of (64, 205k) lanes, the cost
                    # that made the two-plane variant lose e2e).
                    from dhr_tpu.ops.pallas_gip import (
                        decode_packed_candidates,
                        partial_gip_candidates_pallas,
                    )

                    packed_ids = G & (G - 1) == 0
                    red_vals = partial_gip_candidates_pallas(
                        qv, qi, values_T, indices_T, idx.lex_dim, n_dims,
                        n_tile=pallas_tile, interpret=cfg.pallas_interpret,
                        unroll=cfg.pallas_unroll, out_dtype=cand_dtype,
                        reduce_block=G, packed_ids=packed_ids,
                    )
                    if not packed_ids:
                        red_vals, red_rows = red_vals
                    k_local = min(k1, n_local)
                    if (cfg.approx_candidates
                            and red_vals.shape[-1] > 2 * k_local):
                        S = _pick_slices(cfg.candidate_slices,
                                         red_vals.shape[-1], k_local)
                        if S > 1:
                            vals, pos = _stratified_approx(
                                red_vals, k_local, S, cfg.candidate_recall)
                        else:
                            vals, pos = jax.lax.approx_max_k(
                                red_vals, k_local,
                                recall_target=cfg.candidate_recall,
                            )
                    else:
                        vals, pos = blockwise_topk(
                            red_vals, min(k_local, red_vals.shape[-1]),
                            cfg.topk_block,
                        )
                    if packed_ids:
                        vals, rows = decode_packed_candidates(vals, pos, G)
                    else:
                        rows = jnp.take_along_axis(red_rows, pos, axis=-1)
                    return vals, rows + offset
                if pallas_ok:
                    from dhr_tpu.ops.pallas_gip import partial_gip_scores_pallas

                    scores = partial_gip_scores_pallas(
                        qv, qi, values_T, indices_T, idx.lex_dim, n_dims,
                        n_tile=pallas_tile, interpret=cfg.pallas_interpret,
                        unroll=cfg.pallas_unroll, out_dtype=cand_dtype,
                    )
                else:
                    scores = _partial_gip_scores(
                        qv, qi, values_T, indices_T, idx.lex_dim, n_dims
                    )
            elif row_major_ip:
                values = arrs[0]
                J = _pick_row_chunks(cfg.row_chunk, values.shape[0])
                if J > 1:
                    # lax.map over row chunks: the int8->bf16 matmul operand
                    # copy and the score block stay chunk-sized (at 8.8M
                    # rows the full (B, N) plane + operand copy would not
                    # fit next to the 14.6 GB index).  Per-chunk top-(k/J)
                    # then global merge — chunk-level stratified selection.
                    # Rows beyond J*chunk are scored as one small tail slice
                    # (< chunk rows) so J need not divide the row count.
                    chunk, main = _row_chunk_split(values.shape[0], J)
                    k_local = min(k1, n_local)
                    # approximate candidates (rerank path): top-(k/J) per
                    # chunk, the chunk-level analog of stratified slices.
                    # exact mode: top-k_local per chunk — the global top-k
                    # is a subset of the union, so the merge stays exact.
                    approx = cfg.rerank and cfg.approx_candidates
                    k_pc = min(chunk, -(-k_local // J) if approx else k_local)

                    def pool_part(v, off):
                        s = _partial_ip_scores_rowmajor(qv, v)
                        if approx and s.shape[-1] > 2 * k_pc:
                            cv, cr = jax.lax.approx_max_k(
                                s, k_pc, recall_target=cfg.candidate_recall)
                        else:
                            cv, cr = blockwise_topk(
                                s, min(k_pc, s.shape[-1]), cfg.topk_block)
                        return cv, cr + off

                    def one_chunk(off):
                        # dynamic_slice keeps the per-iteration temp
                        # chunk-sized; feeding values[:main].reshape(J,
                        # chunk, D) to lax.map instead forces XLA to
                        # materialize the sliced plane as one HLO temp
                        # COPY next to the resident plane (measured on
                        # chip: +7.34 GiB at 8.8M rows -> compile OOM)
                        v = jax.lax.dynamic_slice_in_dim(values, off, chunk)
                        return pool_part(v, off)

                    offs = jnp.arange(J, dtype=jnp.int32) * chunk
                    vals, rows = jax.lax.map(one_chunk, offs)
                    B = qv.shape[0]
                    vals = jnp.moveaxis(vals, 0, 1).reshape(B, -1)
                    rows = jnp.moveaxis(rows, 0, 1).reshape(B, -1)
                    if main < values.shape[0]:
                        tv, tr = pool_part(values[main:], jnp.int32(main))
                        vals = jnp.concatenate([vals, tv], axis=-1)
                        rows = jnp.concatenate([rows, tr], axis=-1)
                    # always merge-sort the pool: with exact J*k_pc == k_local
                    # the concatenation is chunk-ordered, and stage-1 output
                    # contracts descending score order.
                    vals, pos = blockwise_topk(
                        vals, min(k_local, vals.shape[-1]), cfg.topk_block)
                    rows = jnp.take_along_axis(rows, pos, axis=-1)
                    return vals, rows + offset
                scores = _partial_ip_scores_rowmajor(qv, values)
            else:
                scores = _partial_ip_scores(qv, arrs[0])
            k_local = min(k1, n_local)
            if cfg.rerank and cfg.approx_candidates:
                S = _pick_slices(cfg.candidate_slices, scores.shape[-1],
                                 k_local)
                if S > 1:
                    vals, rows = _stratified_approx(
                        scores, k_local, S, cfg.candidate_recall)
                else:
                    vals, rows = jax.lax.approx_max_k(
                        scores, k_local, recall_target=cfg.candidate_recall
                    )
            else:
                # large k over a huge lane dim: grow the block so the merge
                # pool (n_blocks * k) stays small
                block = max(cfg.topk_block, scores.shape[-1] // 16)
                B = scores.shape[0]
                if scores.shape[-1] >= (1 << 20) and B > 16 and B % 16 == 0:
                    # corpus-scale exact sort: chunk queries so the sort
                    # key/value buffers stay bounded (HBM, not correctness)
                    n_chunks = B // 16
                    chunked = scores.reshape(n_chunks, 16, scores.shape[-1])
                    vals, rows = jax.lax.map(
                        lambda s: blockwise_topk(s, k_local, block), chunked
                    )
                    vals = vals.reshape(B, -1)
                    rows = rows.reshape(B, -1)
                else:
                    vals, rows = blockwise_topk(scores, k_local, block)
            return vals, rows + offset

        # The index planes are passed as runtime ARGUMENTS to the compiled
        # programs (never closed over): a closed-over device array becomes an
        # HLO constant, and gigabyte constants blow up compilation.  (The PQ
        # centroid tables ARE closed over — ~1 MB, replicated.)
        row_major_ip = not has_gip and cfg.mode != "pq" \
            and idx.values_T is None
        if cfg.mode == "pq":
            arrays = (idx.pq_codes,)
            in_specs_arr = (P(shard_axes, None),)
        elif has_gip:
            arrays = (idx.values_T, idx.indices_T)
            in_specs_arr = (P(None, shard_axes), P(None, shard_axes))
        elif row_major_ip:
            arrays = (idx.values,)
            in_specs_arr = (P(shard_axes, None),)
        else:
            arrays = (idx.values_T,)
            in_specs_arr = (P(None, shard_axes),)

        if self.mesh is None or self.mesh.size == 1:
            def raw(qv, qi, *arrs):
                return local(qv, qi, arrs, 0, n_total)

            self._stage1_raw = raw
            self._stage1_arrays = arrays
            run = jax.jit(raw)
            return lambda qv, qi: run(qv, qi, *arrays)

        mesh = self.mesh
        n_local = n_total // n_mesh_dev
        in_specs = (P(), P()) + in_specs_arr

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P()), check_vma=False,
        )
        def sharded(qv, qi, *arrs):
            # shard_axes is ("host", "index") on a hybrid mesh: the collapsed
            # axis_index is host-major, matching the row layout, and the
            # tiny top-k all_gather is the only collective that crosses DCN
            shard_id = jax.lax.axis_index(shard_axes)
            vals, rows = local(
                qv, qi, arrs, shard_id * n_local, n_local
            )
            all_vals = jax.lax.all_gather(vals, shard_axes, axis=-1, tiled=True)
            all_rows = jax.lax.all_gather(rows, shard_axes, axis=-1, tiled=True)
            return merge_topk(all_vals, all_rows, min(k1, all_vals.shape[-1]))

        self._stage1_raw = sharded
        self._stage1_arrays = arrays
        jitted = jax.jit(sharded)
        return lambda qv, qi: jitted(qv, qi, *arrays)

    def _build_stage2(self):
        cfg, idx = self.config, self.index
        if not cfg.rerank or idx.indices is None:
            return None

        # chunk over queries: the (chunk, agip_topk, D) gather + products are
        # the peak transient; 16 queries x 10k x 896 bf16 ~ 280 MB
        q_chunk = max(1, min(cfg.query_batch, 16))

        @jax.jit
        def rerank(qv, qi, cand_rows, values, indices):
            def one(args):
                cqv, cqi, crows = args
                cand_values = jnp.take(values, crows, axis=0)
                cand_indices = jnp.take(indices, crows, axis=0)
                scores = _rerank_gip(
                    cqv, cqi, cand_values, cand_indices, idx.lex_dim
                )
                k = min(cfg.topk, scores.shape[-1])
                vals, pos = jax.lax.top_k(scores, k)
                return vals, jnp.take_along_axis(crows, pos, axis=-1)

            B = qv.shape[0]
            n_chunks = -(-B // q_chunk)
            pad = n_chunks * q_chunk - B
            if pad:
                qv_p = jnp.pad(qv, ((0, pad), (0, 0)))
                qi_p = jnp.pad(qi, ((0, pad), (0, 0)), constant_values=1)
                rows_p = jnp.pad(cand_rows, ((0, pad), (0, 0)))
            else:
                qv_p, qi_p, rows_p = qv, qi, cand_rows
            chunk = lambda x: x.reshape(n_chunks, q_chunk, *x.shape[1:])  # noqa: E731
            vals, rows = jax.lax.map(
                one, (chunk(qv_p), chunk(qi_p), chunk(rows_p))
            )
            vals = vals.reshape(n_chunks * q_chunk, -1)[:B]
            rows = rows.reshape(n_chunks * q_chunk, -1)[:B]
            return vals, rows

        self._rerank_raw = rerank.__wrapped__
        return lambda qv, qi, cand_rows: rerank(
            qv, qi, cand_rows, idx.values, idx.indices
        )

    def _build_prep(self):
        """Device-side query prep: lambda scaling, theta threshold, int8
        scale folding, index widening/padding — one jitted program.

        Keeping prep on device lets :meth:`search` upload only the raw query
        arrays once (the dev-relay charges a flat ~37 ms per host->device
        transfer, so per-batch uploads dominated the old loop).
        ``prepare_queries`` remains as the host-side twin for tools/tests.
        """
        cfg, idx = self.config, self.index
        lex, dim = idx.lex_dim, idx.dim
        scales = idx.value_scales  # (D,) f32 on device, or None (tiny const)
        theta_gip = cfg.theta > 0 and cfg.mode == "gip"

        @jax.jit
        def prep(qv, qi):
            qv = qv.astype(jnp.float32)
            if dim > lex and cfg.lam != 1.0:
                lam_vec = jnp.concatenate(
                    [jnp.ones((lex,), jnp.float32),
                     jnp.full((dim - lex,), cfg.lam, jnp.float32)]
                )
                qv = qv * lam_vec[None, :]
            qv1 = jnp.where(qv > cfg.theta, qv, 0.0) if theta_gip else qv
            qi32 = qi.astype(jnp.int32)
            if qi32.shape[1] < dim:
                qi32 = jnp.pad(
                    qi32, ((0, 0), (0, dim - qi32.shape[1])),
                    constant_values=1,
                )
            if scales is not None:
                qv = qv * scales[None, :]
                qv1 = qv1 * scales[None, :]
            return qv, qv1, qi32

        return prep

    def _build_run_batch(self):
        """One jitted program per batch: dynamic-slice the (uploaded-once)
        query arrays at a traced ``start``, then stage 1 (+ rerank)."""
        cfg, idx = self.config, self.index
        bs = cfg.query_batch
        stage1_raw = self._stage1_raw
        s1_arrays = tuple(self._stage1_arrays)
        rerank_raw = getattr(self, "_rerank_raw", None)
        do_rerank = self._stage2 is not None and rerank_raw is not None

        emit_floor = bool(cfg.escalate_pool)

        # dedupe plane arguments by identity: with layout="row" stage 1
        # and rerank share idx.values, and passing the same buffer as two
        # jit parameters makes XLA budget it TWICE in the compile-time
        # HBM admission check (measured on chip: "arguments 21.0G" at an
        # 8.8M-row 14.6 GB index -> permanent compile OOM)
        _arrays = list(s1_arrays)

        def _pos(a):
            for i, b in enumerate(_arrays):
                if a is b:
                    return i
            _arrays.append(a)
            return len(_arrays) - 1

        if do_rerank:
            val_pos = _pos(idx.values)
            idx_pos = _pos(idx.indices)
        all_arrays = tuple(_arrays)

        @jax.jit
        def run(qv_all, qv1_all, qi_all, start, *arrs):
            qv1 = jax.lax.dynamic_slice_in_dim(qv1_all, start, bs)
            qi = jax.lax.dynamic_slice_in_dim(qi_all, start, bs)
            vals, rows = stage1_raw(qv1, qi, *arrs[: len(s1_arrays)])
            floor = vals.min(axis=-1).astype(jnp.float32)
            if do_rerank:
                qv = jax.lax.dynamic_slice_in_dim(qv_all, start, bs)
                vals, rows = rerank_raw(
                    qv, qi, rows, arrs[val_pos], arrs[idx_pos])
            if emit_floor:
                return vals, rows, floor
            return vals, rows

        if self._tier2 is not None:
            # tier-2 program over the RESIDENT query arrays: gather the
            # escalated queries by index on device (no re-upload, no
            # re-prep) and run the full-pool stage fns.  tier 2's own
            # prep/run programs never compile — only this one does.
            t2_stage1 = self._tier2._stage1_raw
            t2_rerank = self._tier2._rerank_raw

            @jax.jit
            def run_esc(qv_all, qv1_all, qi_all, sel, *arrs):
                qv1 = jnp.take(qv1_all, sel, axis=0)
                qi = jnp.take(qi_all, sel, axis=0)
                vals, rows = t2_stage1(qv1, qi, *arrs[: len(s1_arrays)])
                qv = jnp.take(qv_all, sel, axis=0)
                return t2_rerank(qv, qi, rows, arrs[val_pos], arrs[idx_pos])

            # sel stays HOST numpy: like the main path's np.int32(start),
            # jit replicates it — a jnp.asarray would commit it to one
            # local device, which is incompatible with the globally-
            # sharded query arrays under multi-process SPMD
            self._run_escalated = lambda qvs, qv1s, qif, sel: run_esc(
                qvs, qv1s, qif, np.asarray(sel, np.int32), *all_arrays
            )

        return lambda qvs, qv1s, qif, start: run(
            qvs, qv1s, qif, np.int32(start), *all_arrays
        )

    # -- host API --------------------------------------------------------

    def prepare_queries(self, query_values, query_indices):
        """Lambda CLS scaling, int8 scale folding, theta threshold, padding.

        Returns ``(qv_full, qv_stage1, qi)``: stage 1 sees the thresholded
        values, the rerank sees the full values (reference behavior).
        """
        cfg = self.config
        qv = np.asarray(query_values, np.float32).copy()
        lex = self.index.lex_dim
        if qv.shape[1] > lex and cfg.lam != 1.0:
            qv[:, lex:] *= cfg.lam
        if query_indices is None:
            qi = np.ones(qv.shape, np.int32)
        else:
            qi = np.asarray(query_indices, np.int32)
            if qi.shape[1] < qv.shape[1]:
                pad = np.ones((qi.shape[0], qv.shape[1] - qi.shape[1]), np.int32)
                qi = np.concatenate([qi, pad], axis=1)
        # theta thresholds the (lambda-scaled) query values, like the
        # reference's (query_emb > theta) gather; int8 scale folding happens
        # after so the threshold semantics match the f16 index exactly.
        # IP mode ignores theta: the reference's IP approximation runs the
        # full inner product (gip_retrieval.py:137-139).
        if cfg.theta > 0 and cfg.mode == "gip":
            qv_stage1 = np.where(qv > cfg.theta, qv, 0.0).astype(np.float32)
            # Stage 1 scans only the top min(max_important_dims, dim) query
            # dims by value; the reference scans EVERY dim with qv > theta
            # (gip_retrieval.py:130-136).  Queries with more above-theta
            # dims than the cap get truncated stage-1 scores — fine with
            # --rerank (stage 2 rescores exactly), a ranking deviation
            # without it.  Surface that instead of silently diverging.
            cap = min(cfg.max_important_dims, qv.shape[1])
            n_above = int((qv_stage1 > 0).sum(axis=1).max(initial=0))
            if n_above > cap and not cfg.rerank:
                logging.getLogger(__name__).warning(
                    "theta=%g leaves up to %d important dims per query but "
                    "max_important_dims=%d caps the stage-1 scan; rankings "
                    "may diverge from the reference. Raise "
                    "--max-important-dims or add --rerank.",
                    cfg.theta, n_above, cap,
                )
        else:
            qv_stage1 = qv
        if self.index.value_scales is not None:
            scales = np.asarray(self.index.value_scales)[None, :]
            qv = qv * scales
            qv_stage1 = qv_stage1 * scales
        return qv, qv_stage1, qi

    def _upload(self, query_values, query_indices):
        """Upload a query set once and run device-side prep.

        Pads the batch count to a power of two so repeated calls with
        varying query totals hit a bounded set of compiled shapes (64,
        128, 256, ... rows) instead of one compile per distinct total;
        padded slots are never dispatched.  Indices compact to the
        narrowest int dtype (the relay charges per transferred byte).
        Returns ``(qvs, qv1s, qif, B, n_batches)``.
        """
        qv = np.ascontiguousarray(np.asarray(query_values, np.float32))
        B = qv.shape[0]
        bs = self.config.query_batch
        n_batches = max(1, -(-B // bs))
        n_slots = 1 << (n_batches - 1).bit_length()
        pad = n_slots * bs - B
        if pad:
            qv = np.pad(qv, [(0, pad), (0, 0)])
        if query_indices is None:
            qi = np.ones((qv.shape[0], 1), np.int8)
        else:
            qi = np.asarray(query_indices, np.int32)
            if pad:
                qi = np.pad(qi, [(0, pad), (0, 0)], constant_values=1)
            hi = int(qi.max(initial=0))
            lo = int(qi.min(initial=0))
            if lo >= -128 and hi < 128:
                qi = qi.astype(np.int8)
            elif lo >= -(1 << 15) and hi < (1 << 15):
                qi = qi.astype(np.int16)
        self._warn_truncated_scan(qv[: B])
        qvs, qv1s, qif = self._prep(jnp.asarray(qv), jnp.asarray(qi))
        if self.mesh is not None and jax.process_count() > 1:
            # multi-process SPMD: the sharded stage-1 program needs GLOBAL
            # (mesh-replicated) query arrays; prep ran process-locally on
            # identical inputs, so every process contributes the same data
            from jax.sharding import PartitionSpec
            from dhr_tpu.parallel import global_put

            qvs, qv1s, qif = (
                global_put(jax.device_get(x), self.mesh, PartitionSpec())
                for x in (qvs, qv1s, qif)
            )
        return qvs, qv1s, qif, B, n_batches

    def search(self, query_values, query_indices=None):
        """Search a full query set; returns (scores, row_ids) as numpy.

        Transfer plan (the dev relay charges a flat ~37 ms per transfer, so
        transfers — not compute — dominated the naive loop):

        - the raw query arrays are uploaded ONCE (indices compacted to the
          narrowest int dtype); lambda/theta/scale prep runs on device;
        - each batch is one jitted dispatch that dynamic-slices the resident
          arrays at ``start`` — no per-batch uploads, one compiled program;
        - results start copying back (``copy_to_host_async``) while later
          batches still compute; the final gather mostly finds them ready.
        """
        t0 = time.perf_counter()
        qvs, qv1s, qif, B, n_batches = self._upload(
            query_values, query_indices
        )
        t_up = time.perf_counter()
        bs = self.config.query_batch
        device_out = []
        t_first = t_up
        for bi in range(n_batches):
            out = self._run_batch(qvs, qv1s, qif, bi * bs)
            if bi == 0:
                # the first dispatch blocks on trace+compile when cold;
                # later dispatches only enqueue.  The split lets callers
                # report compile-vs-device time per run (VERDICT r4 #6).
                t_first = time.perf_counter()
            for a in out:
                try:
                    a.copy_to_host_async()
                except Exception:  # noqa: BLE001 - optional fast path
                    pass
            device_out.append(out)
        t_disp = time.perf_counter()
        scores = np.concatenate(
            [np.asarray(o[0]) for o in device_out], axis=0
        )[:B]
        rows = np.concatenate(
            [np.asarray(o[1]) for o in device_out], axis=0
        )[:B]
        t_done = time.perf_counter()
        self.last_timing = {
            "queries": int(B),
            "n_batches": int(n_batches),
            "upload_s": round(t_up - t0, 3),
            # trace + remote compile when cold; ~ms when the program (or
            # the persistent compile cache entry) is warm
            "first_dispatch_s": round(t_first - t_up, 3),
            "dispatch_s": round(t_disp - t_first, 3),
            # device execution + D2H drain of all batches
            "gather_s": round(t_done - t_disp, 3),
            "post_compile_qps": round(
                B / max(t_done - t_first, 1e-9), 2),
        }
        if self._tier2 is not None:
            scores, rows = self._escalate(
                (qvs, qv1s, qif), device_out, scores, rows, B
            )
        return scores, rows

    def _escalate(self, prepped, device_out, scores, rows, B):
        """Tier-2 re-dispatch: queries whose reranked tail sits within
        ``escalate_margin`` of the tier-1 stage-1 pool floor rerun at the
        full ``agip_topk`` (results overwrite theirs in place).  The
        escalated queries are gathered by index from the RESIDENT prepped
        arrays on device — no re-upload, no re-prep — and padded to whole
        ``query_batch`` dispatches (pad slots repeat index 0, discarded)."""
        qvs, qv1s, qif = prepped
        floors = np.concatenate(
            [np.asarray(o[2]) for o in device_out], axis=0
        )[:B]
        esc_idx = np.nonzero(
            (scores[:, -1] - floors) <= self.config.escalate_margin
        )[0]
        self.escalated_queries += len(esc_idx)
        if not len(esc_idx):
            return scores, rows
        bs = self.config.query_batch
        esc_out = []
        for i in range(0, len(esc_idx), bs):
            sel = esc_idx[i:i + bs]
            n_real = len(sel)
            if n_real < bs:
                sel = np.pad(sel, (0, bs - n_real))
            v2, r2 = self._run_escalated(qvs, qv1s, qif, sel)
            for a in (v2, r2):
                try:
                    a.copy_to_host_async()
                except Exception:  # noqa: BLE001 - optional fast path
                    pass
            esc_out.append((v2, r2, n_real))
        scores[esc_idx] = np.concatenate(
            [np.asarray(v)[:n] for v, _, n in esc_out], axis=0
        )
        rows[esc_idx] = np.concatenate(
            [np.asarray(r)[:n] for _, r, n in esc_out], axis=0
        )
        return scores, rows

    def calibrate_escalation(self, query_values, query_indices=None,
                             miss_mass_target=0.95):
        """Measure the small-vs-full pool gap on a query sample and return
        the ``escalate_margin`` that escalates the queries covering
        ``miss_mass_target`` of the missing-row mass (rows the full pool
        returns in the top-k that the small pool misses), escalating
        smallest-margin queries first.

        The margin is corpus- and theta-dependent (it is a gap between a
        reranked full-GIP score and a truncated stage-1 score), so it must
        be calibrated per index — run this once on a held-out query sample
        and pass the result as ``escalate_margin`` / ``--escalate-margin``.

        Runs both tiers on every sample query: tier 1 via the normal
        batch program, the full pool via the tier-2 resident-gather
        program.  Returns a dict of the recommended margin plus the
        overlap/escalation-fraction evidence behind it.
        """
        if self._tier2 is None:
            raise ValueError(
                "calibrate_escalation needs escalate_pool > 0 "
                "(build the Searcher with the tier-1 pool to calibrate)"
            )
        qvs, qv1s, qif, B, n_batches = self._upload(
            query_values, query_indices
        )
        bs = self.config.query_batch
        # dispatch every batch of both tiers before fetching anything —
        # the relay charges a flat ~31 ms per round trip, so a fetch
        # inside the dispatch loop would serialize compute and transfer
        # (same plan as search())
        pending = []
        for bi in range(n_batches):
            v, r, f = self._run_batch(qvs, qv1s, qif, bi * bs)
            sel = np.arange(bi * bs, (bi + 1) * bs, dtype=np.int32)
            v2, r2 = self._run_escalated(qvs, qv1s, qif, sel)
            kv = v[:, -1]  # device slice: fetch (bs,) not (bs, topk)
            for a in (kv, r, f, r2):
                try:
                    a.copy_to_host_async()
                except Exception:  # noqa: BLE001 - optional fast path
                    pass
            pending.append((kv, r, f, r2))
        rows1 = np.concatenate([np.asarray(r) for _, r, _, _ in pending])[:B]
        rows_full = np.concatenate(
            [np.asarray(r2) for _, _, _, r2 in pending])[:B]
        kth = np.concatenate(
            [np.asarray(kv, np.float32) for kv, _, _, _ in pending])[:B]
        margin = kth - np.concatenate(
            [np.asarray(f, np.float32) for _, _, f, _ in pending])[:B]
        k = rows1.shape[1]
        ov = np.array([
            len(np.intersect1d(rows1[i], rows_full[i])) / k for i in range(B)
        ])
        miss = (1.0 - ov) * k
        out = {
            "pool": self.config.escalate_pool,
            "agip_topk": self.config.agip_topk,
            "n_queries": B,
            "overlap_small_mean": float(ov.mean()),
            "overlap_small_min": float(ov.min()),
            "frac_deficient": float((ov < 1.0).mean()),
        }
        if miss.sum() == 0:
            # the small pool already reproduces the full pool on this
            # sample; a margin below every observed margin never escalates
            out["escalate_margin"] = float(margin.min()) - 1.0
            out["frac_escalated"] = 0.0
            out["overlap_after_mean"] = 1.0
            return out
        order = np.argsort(margin)
        cum = np.cumsum(miss[order]) / miss.sum()
        i_t = int(np.searchsorted(cum, miss_mass_target))
        t = float(margin[order][min(i_t, B - 1)])
        esc = margin <= t
        ov_after = ov.copy()
        ov_after[esc] = 1.0
        out["escalate_margin"] = t
        out["frac_escalated"] = float(esc.mean())
        out["overlap_after_mean"] = float(ov_after.mean())
        return out

    def _warn_truncated_scan(self, qv: np.ndarray) -> None:
        """Stage 1 scans only the top min(max_important_dims, dim) query
        dims by value; the reference scans EVERY dim with qv > theta
        (gip_retrieval.py:130-136).  Queries with more above-theta dims than
        the cap get truncated stage-1 scores — fine with --rerank (stage 2
        rescores exactly), a ranking deviation without it.  Surface that
        instead of silently diverging."""
        cfg = self.config
        if not (cfg.theta > 0 and cfg.mode == "gip" and not cfg.rerank):
            return
        lex = self.index.lex_dim
        if qv.shape[1] > lex and cfg.lam != 1.0:
            qv = qv.copy()
            qv[:, lex:] *= cfg.lam
        cap = min(cfg.max_important_dims, qv.shape[1])
        n_above = int((qv > cfg.theta).sum(axis=1).max(initial=0))
        if n_above > cap:
            logging.getLogger(__name__).warning(
                "theta=%g leaves up to %d important dims per query but "
                "max_important_dims=%d caps the stage-1 scan; rankings "
                "may diverge from the reference. Raise "
                "--max-important-dims or add --rerank.",
                cfg.theta, n_above, cap,
            )

    def search_run(self, qids, query_values, query_indices=None):
        """Search returning TREC-ready ``{qid: [docid...]}, {qid: [score...]}``."""
        scores, rows = self.search(query_values, query_indices)
        docids = self.index.docids
        results, out_scores = {}, {}
        n = self.index.num_rows
        for i, qid in enumerate(qids):
            keep = rows[i] < n
            results[str(qid)] = [str(docids[j]) for j in rows[i][keep]]
            out_scores[str(qid)] = [float(x) for x in scores[i][keep]]
        return results, out_scores


def calibrate_pool(index: DeviceIndex, config: SearchConfig,
                   query_values, query_indices=None,
                   pools=(10000, 5000, 2000, 1000),
                   overlap_target: float = 0.99, passes: int = 3):
    """Measure the candidate-pool throughput/quality frontier on a query
    sample and recommend the smallest ``agip_topk`` whose final top-k
    overlaps the largest pool's at ``overlap_target``.

    The pool is the dominant throughput/quality lever of the rerank path:
    the candidate top-k is k-bound and the rerank gather is
    pool-proportional, so shrinking the pool cuts the two non-theta stages
    (measured on the trained-rep bench distribution: 10k -> 2000 buys
    1.45x at top-1000 overlap 0.972 with top-10 unchanged — design.md
    "Operating-point re-sweep").  The right pool is corpus-dependent, so —
    like :meth:`Searcher.calibrate_escalation` — this runs the measurement
    per index on a held-out query sample.  The reference engine scores
    every row and has no such knob (gip_retrieval.py:128-156); its
    ``--agip_topk`` only sizes the rerank.

    Timing passes are interleaved round-robin across the pools so relay /
    clock drift cancels instead of crediting whichever config ran in the
    fast minutes (the protocol that exposed a fake 8.5% unroll win in the
    round-4 sweep).  Quality (overlap vs the largest pool) comes from the
    warmup pass — rankings are deterministic across passes.

    Returns a dict: per-pool ``{qps_median, qps_best, overlap_mean,
    overlap_min}`` plus ``recommended_pool`` — the smallest pool in the
    descending run of pools that all meet the target (the largest pool
    trivially qualifies, so it is also the "no change" answer) — and the
    sample/protocol metadata.
    """
    import time

    if not config.rerank:
        raise ValueError("calibrate_pool sweeps agip_topk, which only "
                         "exists on the rerank path (rerank=True)")
    pools = sorted({int(p) for p in pools}, reverse=True)
    if len(pools) < 2:
        raise ValueError("calibrate_pool needs at least two pool sizes")
    if pools[-1] < config.topk:
        raise ValueError(
            f"every pool must be >= topk={config.topk} (got {pools[-1]})"
        )
    searchers = {
        p: Searcher(index, dataclasses.replace(
            config, agip_topk=p, escalate_pool=0))
        for p in pools
    }
    n_rows = index.num_rows
    rows_by_pool = {}
    for p in pools:  # warmup (compile) pass; also the quality measurement
        _, rows = searchers[p].search(query_values, query_indices)
        rows_by_pool[p] = rows
    B = rows_by_pool[pools[0]].shape[0]
    times = {p: [] for p in pools}
    for i in range(passes):
        order = pools if i % 2 == 0 else pools[::-1]
        for p in order:
            t0 = time.monotonic()
            searchers[p].search(query_values, query_indices)
            times[p].append(time.monotonic() - t0)
    ref_rows = rows_by_pool[pools[0]]
    report = {
        "topk": config.topk,
        "n_queries": B,
        "passes": passes,
        "overlap_target": overlap_target,
        "reference_pool": pools[0],
        "pools": {},
    }
    for p in pools:
        ov = np.array([
            len(np.intersect1d(
                rows_by_pool[p][i][rows_by_pool[p][i] < n_rows],
                ref_rows[i][ref_rows[i] < n_rows],
            )) / config.topk
            for i in range(B)
        ])
        med = float(np.median(times[p]))
        report["pools"][p] = {
            "qps_median": round(B / med, 1),
            "qps_best": round(B / min(times[p]), 1),
            "pass_s": [round(t, 4) for t in times[p]],
            "overlap_mean": round(float(ov.mean()), 4),
            "overlap_min": round(float(ov.min()), 4),
        }
    # smallest pool of the descending all-qualify prefix: stop at the first
    # miss so a fluke qualifier below a disqualified pool is never picked
    recommended = pools[0]
    for p in pools:
        if report["pools"][p]["overlap_mean"] >= overlap_target:
            recommended = p
        else:
            break
    report["recommended_pool"] = recommended
    return report
