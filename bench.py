"""Headline benchmark: GIP retrieval queries/sec on one TPU chip.

Operating point = the reference's documented best-quality configuration
(docs/dhr/msmarco-passage-train-eval.md:114-125): theta=0.3 approximate GIP
with exact-GIP rerank of the top agip_topk=10000, final top-k 1000.  Index
layout is the int8 per-dim value-plane mode (1 B/dim values + int8 argmax
indices, scales folded into the query) — the framework's default serving
memory config; candidate generation uses stratified approx_max_k at
recall_target 0.95, followed by the EXACT rerank like the reference.

Index + queries: the trained-rep-statistics generator
(dhr_tpu/retrieval/synth.py): query mass concentrates so ~36 of 768 lex
dims clear theta=0.3 (<2% of queries exceed the 48-dim stage-1 scan cap),
Zipf dim/fold usage, topical co-activation — calibrated in
tools/rep_stats.py so that (a) the benched staged engine and the
reference's scan-every-above-theta-dim stage 1
(/root/reference/retrieval/gip_retrieval.py:130-136) do EQUAL per-query
work, and (b) staged final rankings agree with the reference-theta path
(1.0 overlap at k=10/100/1000 at 204k rows) and with exact GIP (0.998).
Every bench run re-verifies agreement on-chip at full scale on a query
subsample and reports it in the detail block.  1.64M rows is what fits one
v5e chip with both row- and dim-major planes resident; the JSON also
reports the 8.8M-corpus-equivalent rate (bandwidth-proportional) for
comparison at MS MARCO scale.

vs_baseline (MEASURED, equal work, generous scaling): the reference's own
gip_retrieval.py engine, fed THIS generator's corpus/queries (identical
key/streams — tools/reference_harness.py --timing-only --timing-dist
trained), measures 3.75 q/s at 100k rows on one CPU core of this host at
the same operating point.  vs_baseline = our q/s divided by that
measurement row-scaled to this index size and granted PERFECT linear
scaling to the 72 CPU threads the reference pins
(gip_retrieval.py:255-259) — generous to the reference, since its
per-query loop is memory-bound and would not scale linearly.  The older
100 q/s GPU *estimate* (8.8M rows, A100-class) is demoted to the detail
block (`vs_reference_gpu_estimate_8.8M`).

Also runs a hardware smoke: the Pallas theta-pass kernel vs the lax.scan
reference path on a small row slice must agree on-chip (the CI suite only
covers the kernel in interpret mode).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache (helps repeat runs where the backend honors it)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

N_ROWS = 1_638_400  # 16 x 102400 — tiles evenly for the Pallas kernel; fits one chip
LEX_DIM = 768
CLS_DIM = 128
N_QUERIES = 1024  # amortizes the relay's flat per-transfer latency
QUERY_BATCH = 128
THETA = 0.3
MAX_IMPORTANT = 48
AGREE_QUERIES = 64  # exact-GIP agreement subsample (brute force ~108 q/s)
REFERENCE_QPS_ESTIMATE_GPU = 100.0  # GPU estimate at 8.8M rows; see docstring
# MEASURED equal-work anchor: reference gip_retrieval CPU path fed this
# bench's exact corpus/query distribution (trained-rep statistics), 100k
# rows, 1 core, theta=0.3 + rerank@10k (tools/reference_harness.py
# --timing-only --timing-dist trained, 2026-08-18 run; docs/design.md
# "Bench distribution").
REFERENCE_QPS_MEASURED_CPU_100K = 3.75
REFERENCE_CPU_THREADS = 72  # gip_retrieval.py:255-259 pins 72 threads
# legacy anchor (round 2, i.i.d. exp(-4u) distribution — ~5x the stage-1
# work): 1.38 q/s at 100k rows 1 core; kept for cross-round comparability
REFERENCE_QPS_MEASURED_CPU_100K_LEGACY = 1.38
REFERENCE_CORPUS_ROWS = 8_841_823
# v5e HBM roofline (per chip). Stage GB/s in the bench detail is reported
# against this so floor claims ("~350 GB/s = 43% plateau", docs/design.md)
# are checkable from the JSON alone (VERDICT r4 #5).
HBM_PEAK_GBPS_V5E = 819.0


def _load_measured_points():
    """Committed on-chip measurements at >=8.8M rows (docs/measured_points
    .json, written by the round-5 big-index probe).  Returned verbatim in
    the detail block; absent file -> a note, never a failure."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "measured_points.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        # ValueError covers a corrupt/partial file: bench must still print
        # its one JSON line (CLAUDE.md contract), never traceback here.
        return {"note": "docs/measured_points.json not present"}


def build_device_index(seed: int = 0):
    """Corpus planes from the trained-rep-statistics generator, chunked +
    int8-quantized on device in one jitted program (eager per-op dispatch
    through the dev tunnel costs a remote compile per op)."""
    import jax

    from dhr_tpu.retrieval import DeviceIndex
    from dhr_tpu.retrieval.synth import SynthConfig, synth_index_planes

    v_i8, folds, scales, _ = synth_index_planes(
        jax.random.PRNGKey(seed), N_ROWS, SynthConfig(), n_chunks=16
    )
    docids = np.arange(N_ROWS).astype(str).astype(object)
    idx = DeviceIndex.from_arrays(
        v_i8, folds, docids, lex_dim=LEX_DIM, value_scales=scales
    )
    jax.block_until_ready(idx.values_T)
    return idx


def synth_queries(seed: int, n: int):
    """Queries from the SAME world as the corpus (shared key, stream 1) —
    the prefix the reference-anchor harness slices."""
    import jax

    from dhr_tpu.retrieval.synth import SynthConfig, synth_reps

    qv, qf, _ = synth_reps(
        jax.random.PRNGKey(seed), n, SynthConfig(), "query", stream=1
    )
    return np.asarray(qv, np.float32), np.asarray(qf, np.int32)


def kernel_hardware_smoke(index, qv1_scaled, qi, n_smoke_rows=204_800):
    """Pallas kernel vs lax.scan path on-chip over a row slice: must agree.

    CI covers the kernel only in interpret mode (tests/test_pallas_gip.py);
    this pins correctness on the real hardware every bench run.
    """
    import jax.numpy as jnp

    from dhr_tpu.ops.pallas_gip import partial_gip_scores_pallas
    from dhr_tpu.retrieval.searcher import _partial_gip_scores

    vT = index.values_T[:, :n_smoke_rows]
    iT = index.indices_T[:, :n_smoke_rows]
    qv_d = jnp.asarray(qv1_scaled[:8])
    qi_d = jnp.asarray(qi[:8])
    got = partial_gip_scores_pallas(
        qv_d, qi_d, vT, iT, LEX_DIM, MAX_IMPORTANT, n_tile=102_400, unroll=8
    )
    want = _partial_gip_scores(qv_d, qi_d, vT, iT, LEX_DIM, MAX_IMPORTANT)
    diff = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want)))
    assert diff <= 1e-3 * max(scale, 1.0), (
        f"pallas kernel diverges from scan path on hardware: {diff}"
    )
    # the bf16-out candidate variant (serving default with rerank) must match
    # within bf16 rounding of the same scores
    got16 = partial_gip_scores_pallas(
        qv_d, qi_d, vT, iT, LEX_DIM, MAX_IMPORTANT, n_tile=102_400, unroll=8,
        out_dtype=jnp.bfloat16,
    ).astype(jnp.float32)
    diff16 = float(jnp.max(jnp.abs(got16 - want)))
    assert diff16 <= 8e-3 * max(scale, 1.0), (
        f"bf16-out kernel diverges beyond rounding on hardware: {diff16}"
    )
    return diff


def measure_stage_times(searcher, qv, qi, n_iters=5):
    """Per-stage decomposition of one query batch (VERDICT r3 #6).

    Times three nested programs — theta-pass kernel alone, stage 1
    (kernel + candidate selection), and the fused per-batch program
    (stage 1 + exact rerank) — and reports the differences.  Each is a
    separate compile; costs ~2 extra remote compiles per bench run.
    """
    import jax
    import jax.numpy as jnp

    from dhr_tpu.ops.pallas_gip import partial_gip_scores_pallas
    from dhr_tpu.retrieval.searcher import (
        _partial_gip_scores, _pick_pallas_tile,
    )

    cfg, idx = searcher.config, searcher.index
    bs = cfg.query_batch
    _, qv1, qif = searcher.prepare_queries(qv[:bs], qi[:bs])
    qv1_d, qi_d = jnp.asarray(qv1), jnp.asarray(qif)
    vT, iT = idx.values_T, idx.indices_T
    n_dims = min(cfg.max_important_dims, idx.dim)
    out_dtype = jnp.bfloat16 if cfg.rerank and cfg.candidate_bf16 \
        else jnp.float32
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if cfg.use_pallas in (True, "auto") and on_tpu:
        tile = cfg.pallas_n_tile or _pick_pallas_tile(
            vT.shape[1], vT.dtype.itemsize, cfg.pallas_unroll,
            narrow_out=out_dtype != jnp.float32,
        )
        kernel = jax.jit(lambda a, b, c, d: partial_gip_scores_pallas(
            a, b, c, d, idx.lex_dim, n_dims, n_tile=tile,
            unroll=cfg.pallas_unroll, out_dtype=out_dtype,
        ))
    else:  # CPU smoke path: time the scan twin instead
        kernel = jax.jit(lambda a, b, c, d: _partial_gip_scores(
            a, b, c, d, idx.lex_dim, n_dims))

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_iters * 1e3

    theta_ms = timed(kernel, qv1_d, qi_d, vT, iT)
    stage1_ms = timed(searcher._stage1, qv1_d, qi_d)
    # upload the FULL query set: the fused run program is shape-specialized
    # and already compiled for it by the main timing loop
    qvs, qv1s, qifs, _, _ = searcher._upload(qv, qi)
    total_ms = timed(lambda: searcher._run_batch(qvs, qv1s, qifs, 0))

    # ---- roofline accounting (VERDICT r4 #5): per-stage HBM bytes moved,
    # achieved GB/s, and fraction of the v5e roofline.  Byte counts are the
    # *algorithmic* HBM traffic of each stage (what the kernel must stream),
    # so roofline_frac is a true lower bound on memory-system utilization:
    # - theta pass streams, per (query, scanned dim), one dim-major value
    #   row + one index row of N bytes each (no cross-query dedup — the
    #   union kernel was measured-rejected, docs/design.md), and writes the
    #   (B, N) score plane once;
    # - candidate selection re-reads the (B, N) scores (approx_max_k is
    #   k-bound, so its extra traffic is negligible);
    # - rerank gathers agip_topk row-major rows (values incl. CLS tail +
    #   index bytes) per query.
    n_rows = int(vT.shape[1])
    out_is = jnp.dtype(out_dtype).itemsize
    score_plane = bs * n_rows * out_is
    theta_bytes = (bs * n_dims * n_rows * (vT.dtype.itemsize
                                           + iT.dtype.itemsize)
                   + score_plane)
    cand_bytes = score_plane
    cand_ms = max(0.0, stage1_ms - theta_ms)
    rerank_ms = max(0.0, total_ms - stage1_ms)
    if cfg.rerank and idx.values is not None:
        pool = min(cfg.agip_topk, n_rows)
        rerank_bytes = bs * pool * (
            idx.dim * idx.values.dtype.itemsize
            + idx.lex_dim * idx.indices.dtype.itemsize)
    else:
        rerank_bytes = 0
    peak = HBM_PEAK_GBPS_V5E if on_tpu else None

    def _roof(nbytes, ms):
        if ms <= 0:
            return {"bytes_moved": int(nbytes)}
        gbps = nbytes / (ms * 1e-3) / 1e9
        d = {"bytes_moved": int(nbytes), "gbps": round(gbps, 1)}
        if peak:
            d["roofline_frac"] = round(gbps / peak, 3)
        return d

    total_bytes = theta_bytes + cand_bytes + rerank_bytes
    return {
        "batch_queries": bs,
        "theta_kernel_ms": round(theta_ms, 2),
        "candidate_select_ms": round(cand_ms, 2),
        "rerank_ms": round(rerank_ms, 2),
        "total_batch_ms": round(total_ms, 2),
        "device_ms_per_query": round(total_ms / bs, 4),
        "hbm_peak_gbps": peak,
        "roofline": {
            "theta_kernel": _roof(theta_bytes, theta_ms),
            "candidate_select": _roof(cand_bytes, cand_ms),
            "rerank": _roof(rerank_bytes, rerank_ms),
            "total": _roof(total_bytes, total_ms),
        },
    }


def measure_agreement(searcher, qv, qi, staged_rows, k_list=(10, 100, 1000)):
    """Full-scale staged-vs-exact final-ranking agreement on a query
    subsample, re-verified on-chip every bench run (VERDICT r3 #1)."""
    import dataclasses

    from dhr_tpu.retrieval import Searcher

    n = min(AGREE_QUERIES, qv.shape[0])
    exact = Searcher(searcher.index, dataclasses.replace(
        searcher.config, theta=0.0, rerank=False, approx_candidates=False,
        candidate_bf16=False, query_batch=min(64, n),
    ))
    _, erows = exact.search(qv[:n], qi[:n])
    out = {}
    for k in k_list:
        agree = [
            len(set(a[:k].tolist()) & set(b[:k].tolist())) / k
            for a, b in zip(staged_rows[:n], erows)
        ]
        out[f"staged_vs_exact@{k}"] = round(float(np.mean(agree)), 4)
    return out


def measure_encode_throughput(rng, batch_size=256, seq_len=128, n_iters=5):
    """Secondary metric: DistilBERT-base DHR passage encode throughput."""
    import jax
    import jax.numpy as jnp

    from dhr_tpu.encode import EncodeConfig, Encoder
    from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
    from dhr_tpu.models.transformer import EncoderConfig

    cfg = RetrieverConfig(
        model_type="dhr", encoder=EncoderConfig.distilbert_base(),
        add_pooler=True, projection_dim=CLS_DIM, dlr_out_dim=LEX_DIM,
    )
    model = BiEncoder(cfg)
    ids = jnp.asarray(
        rng.integers(999, 30000, (batch_size, seq_len)), jnp.int32
    )
    mask = jnp.ones((batch_size, seq_len), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        passage={"input_ids": ids[:2], "attention_mask": mask[:2]},
    )["params"]
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=batch_size))
    v, _ = enc._encode_passage(ids, mask)
    _ = float(v[0, 0])
    # pipeline the dispatches; ONE scalar fetch at the end — a per-iteration
    # fetch through the dev relay adds a flat ~31-100 ms sync per batch and
    # under-reports the device rate by ~40%
    t0 = time.perf_counter()
    for _ in range(n_iters):
        v, _ = enc._encode_passage(ids, mask)
    _ = float(v[0, 0])
    dt = (time.perf_counter() - t0) / n_iters
    return batch_size / dt


def main():
    from dhr_tpu.retrieval import SearchConfig, Searcher

    global N_ROWS
    rng = np.random.default_rng(0)
    # fall back to smaller indexes if this chip has less free HBM
    last_err = None
    for n_rows in (N_ROWS, N_ROWS // 2, N_ROWS // 4):
        N_ROWS = n_rows
        try:
            t0 = time.perf_counter()
            index = build_device_index(seed=0)
            build_compile_s = time.perf_counter() - t0
            break
        except Exception as e:  # noqa: BLE001 - resource exhaustion retry
            last_err = e
    else:
        raise last_err
    # warm rebuild: the program is compiled now, so this is the true on-
    # device index build time (the first call is dominated by the remote
    # compile, which the dev tunnel does not cache across processes)
    del index
    t0 = time.perf_counter()
    index = build_device_index(seed=0)
    build_s = time.perf_counter() - t0

    searcher = Searcher(
        index,
        SearchConfig(
            topk=1000, mode="gip", theta=THETA, rerank=True, agip_topk=10000,
            max_important_dims=MAX_IMPORTANT, query_batch=QUERY_BATCH,
            pallas_unroll=8,
        ),
    )
    op_cfg = {
        "query_batch": QUERY_BATCH,
        "theta": THETA,
        "agip_topk": 10000,
        "max_important_dims": MAX_IMPORTANT,
        "candidate_slices": str(searcher.config.candidate_slices),
        "fused_candidates": str(searcher.config.fused_candidates),
        "pallas_unroll": searcher.config.pallas_unroll,
        "distribution": "trained-rep-statistics (synth.py), corpus seed 0",
    }
    qv, qi = synth_queries(0, N_QUERIES)
    above = (qv[:, :LEX_DIM] > THETA).sum(axis=1)

    # hardware smoke: kernel vs scan on a slice (uses prepared queries so
    # the scales/theta folding matches the searcher's exactly)
    _, qv1, qi_full = searcher.prepare_queries(qv, qi)
    smoke_diff = kernel_hardware_smoke(index, qv1, qi_full)

    # warmup (compile both stages) — on the FULL query arrays: the prep/run
    # programs specialize on the uploaded-array shape, so a small-batch
    # warmup leaves a ~10 s compile inside the first timed pass
    t0 = time.perf_counter()
    s, r = searcher.search(qv, qi)
    _ = float(s[0, 0])
    warm_s = time.perf_counter() - t0

    # median of 5 passes: the dev relay adds multi-ms jitter per dispatch
    # and occasional slow passes; the median reflects sustained throughput
    # (best/all passes reported in the detail block)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        scores, rows = searcher.search(qv, qi)
        _ = float(scores[-1, -1])
        times.append(time.perf_counter() - t0)
    elapsed = float(np.median(times))
    elapsed_best = min(times)

    # per-stage decomposition + full-scale staged-vs-exact agreement
    # (each is extra remote compiles; degrade to an error note, never
    # fail the headline)
    try:
        stage_ms = measure_stage_times(searcher, qv, qi)
    except Exception as e:  # noqa: BLE001 - diagnostics must not kill bench
        stage_ms = {"error": f"{type(e).__name__}: {e}"}
    try:
        agreement = measure_agreement(searcher, qv, qi, rows)
    except Exception as e:  # noqa: BLE001
        agreement = {"error": f"{type(e).__name__}: {e}"}

    del index, searcher  # free HBM for the encode measurement
    encode_pps = measure_encode_throughput(rng)

    qps = N_QUERIES / elapsed
    qps_msmarco_equiv = qps * N_ROWS / REFERENCE_CORPUS_ROWS
    # measured anchor, row-scaled to this index + perfect 72-thread scaling
    anchor_qps = (REFERENCE_QPS_MEASURED_CPU_100K * 100_000 / N_ROWS
                  * REFERENCE_CPU_THREADS)
    result = {
        "metric": (
            f"GIP queries/sec, 1 chip, {N_ROWS / 1e6:.2f}M-passage index, "
            "theta=0.3+rerank@10k, int8 planes, trained-rep distribution"
        ),
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps / anchor_qps, 3),
        "detail": {
            "vs_baseline_provenance": (
                "measured reference-engine anchor on identical data: "
                f"{REFERENCE_QPS_MEASURED_CPU_100K} q/s at 100k rows / 1 CPU "
                f"core, row-scaled to {N_ROWS} rows and granted perfect "
                f"linear scaling to the reference's 72 pinned threads "
                f"(= {round(anchor_qps, 2)} q/s)"
            ),
            "elapsed_s": round(elapsed, 3),
            "qps_best_pass": round(N_QUERIES / elapsed_best, 2),
            "pass_times_s": [round(t, 3) for t in times],
            "index_build_s": round(build_s, 2),
            "index_build_compile_s": round(build_compile_s, 1),
            "warmup_s": round(warm_s, 1),
            "n_queries": N_QUERIES,
            "operating_point": op_cfg,
            "query_dims_above_theta": {
                "mean": round(float(above.mean()), 1),
                "p99": int(np.percentile(above, 99)),
                "frac_above_scan_cap": round(
                    float((above > MAX_IMPORTANT).mean()), 4),
            },
            "stage_ms": stage_ms,
            "ranking_agreement": agreement,
            "index_rows": N_ROWS,
            "qps_8.8M_equivalent": round(qps_msmarco_equiv, 2),
            # measured (not row-scaled) large-index points, recorded once
            # on-chip by the round-5 big-index probe and committed as an
            # artifact so the extrapolated 8.8M figure above ships next to
            # a real >=8.8M-row measurement (VERDICT r4 #4)
            "measured_large_index": _load_measured_points(),
            "topk_returned": int(rows.shape[1]),
            "kernel_smoke_max_diff": round(smoke_diff, 6),
            "encode_passages_per_sec": round(encode_pps, 1),
            "reference_cpu_qps_measured_100k_rows_1core": (
                REFERENCE_QPS_MEASURED_CPU_100K
            ),
            "vs_reference_cpu_1core_row_scaled": round(
                qps / (REFERENCE_QPS_MEASURED_CPU_100K * 100_000 / N_ROWS), 1
            ),
            "vs_reference_gpu_estimate_8.8M": round(
                qps_msmarco_equiv / REFERENCE_QPS_ESTIMATE_GPU, 3
            ),
            "legacy_distribution_anchor_cpu_1core_100k": (
                REFERENCE_QPS_MEASURED_CPU_100K_LEGACY
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.stderr.write("bench: starting\n")
    try:
        main()
    except Exception as e:  # noqa: BLE001 - keep the one-JSON-line contract
        # The dev relay's TPU leg can be UNAVAILABLE for stretches (backend
        # init retries ~50 min, then raises). Emit the contractual single
        # JSON line with the error so the captured artifact is diagnosable
        # instead of an empty stdout, then fail the process.
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "GIP queries/sec, 1 chip (FAILED)",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
