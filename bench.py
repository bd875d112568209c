"""Headline benchmark: GIP retrieval queries/sec on one TPU chip.

Operating point = the reference's documented best-quality configuration
(docs/dhr/msmarco-passage-train-eval.md:114-125): theta=0.3 approximate GIP
with exact-GIP rerank of the top agip_topk=10000, final top-k 1000.  Index
layout is the int8 per-dim value-plane mode (1 B/dim values + int8 argmax
indices, scales folded into the query) — the framework's default serving
memory config; candidate generation uses approx_max_k at recall_target 0.95
(measured top-1000 recall inside the candidate pool: 0.9977), followed by
the EXACT rerank like the reference.

Index: synthetic 1.64M-passage index generated ON DEVICE (sparse-positive
gamma-like lexical values, uniform argmax folds) — what fits one v5e chip
with both row- and dim-major planes resident.  The JSON also reports the
8.8M-corpus-equivalent rate (bandwidth-proportional) for comparison at MS
MARCO scale.  Candidate selection is the round-3 stratified approx path
(candidate_slices auto -> 16; measured pool recall equal-or-better than
the global top-k at lower selection cost — docs/design.md), query_batch
128 (0.822 ms/query device-side vs 0.961 at 64, interleaved A/B).

vs_baseline: measured q/s divided by 100 q/s — our estimate of the reference
GPU engine at the same operating point on the full 8.8M index.  The reference
publishes no throughput numbers (SURVEY.md section 6); 100 q/s is generous to
it: its per-query loop gathers ~30-50 important columns from row-major arrays
(~0.8 GB strided reads/query) plus a 10k-candidate rerank, bounding it to low
hundreds of q/s on an A100-class part before Python overhead.

MEASURED anchor (round 2, tools/reference_harness.py + docs/parity_run.md):
the reference's own gip_retrieval CPU path at the same operating point and
value distribution runs 1.38 q/s on a 100k-row index on one CPU core of this
host (0.084 q/s row-scaled to this bench's 1.64M rows; its 72-thread CPU
config would be ~6 q/s at perfect scaling).  The GPU estimate above remains
an estimate; the CPU point is a measurement, reported in the detail block.

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
N_FOLDS = 39
N_QUERIES = 1024  # amortizes the relay's flat per-transfer latency
QUERY_BATCH = 128
THETA = 0.3
MAX_IMPORTANT = 48
REFERENCE_QPS_ESTIMATE = 100.0  # GPU estimate; see module docstring
# measured: reference gip_retrieval CPU path, 100k rows, 1 core, theta=0.3
# + rerank@10k (tools/reference_harness.py run, docs/parity_run.md)
REFERENCE_QPS_MEASURED_CPU_100K = 1.38
REFERENCE_CORPUS_ROWS = 8_841_823


def synth_index_arrays(seed: int):
    """One jitted program: synth + per-dim int8 quantization on device.

    The whole build is a single compile: eager per-op dispatch through the
    dev tunnel costs a remote compile per op (measured 77+ s); the jitted
    twin executes in ~0.3 s once compiled.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def synth(key):
        k1, k2, k3 = jax.random.split(key, 3)
        # sparse-positive lexical values: exp(-4u) gives a heavy-at-zero,
        # occasionally-large profile like softmax-x-term-weight reps
        lex = jnp.exp(-4.0 * jax.random.uniform(k1, (N_ROWS, LEX_DIM)))
        cls = jax.random.normal(k2, (N_ROWS, CLS_DIM)) * 0.3
        values = jnp.concatenate([lex, cls], axis=1)
        amax = jnp.max(jnp.abs(values), axis=0, keepdims=True)
        scales = jnp.where(amax > 0, amax / 127.0, 1.0)
        v_i8 = jnp.clip(
            jnp.round(values / scales), -127, 127
        ).astype(jnp.int8)
        indices = jax.random.randint(
            k3, (N_ROWS, LEX_DIM), 0, N_FOLDS, dtype=jnp.int8
        )
        return v_i8, indices, scales[0].astype(jnp.float32)

    return synth(jax.random.PRNGKey(seed))


def build_device_index(seed: int = 0):
    import jax

    from dhr_tpu.retrieval import DeviceIndex

    v_i8, indices, scales = synth_index_arrays(seed)
    docids = np.arange(N_ROWS).astype(str).astype(object)
    idx = DeviceIndex.from_arrays(
        v_i8, indices, docids, lex_dim=LEX_DIM, value_scales=scales
    )
    jax.block_until_ready(idx.values_T)
    return idx


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


def synth_queries(rng, n):
    qv = np.exp(-4.0 * rng.random((n, LEX_DIM))).astype(np.float32)
    qc = (rng.standard_normal((n, CLS_DIM)) * 0.3).astype(np.float32)
    qi = rng.integers(0, N_FOLDS, (n, LEX_DIM)).astype(np.int32)
    return np.concatenate([qv, qc], axis=1), qi


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
    index = build_device_index(seed=1)
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
    }
    qv, qi = synth_queries(rng, N_QUERIES)

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

    del index, searcher  # free HBM for the encode measurement
    encode_pps = measure_encode_throughput(rng)

    qps = N_QUERIES / elapsed
    qps_msmarco_equiv = qps * N_ROWS / REFERENCE_CORPUS_ROWS
    result = {
        "metric": "GIP queries/sec, 1 chip, 1.64M-passage index, theta=0.3+rerank@10k, int8 planes",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps_msmarco_equiv / REFERENCE_QPS_ESTIMATE, 3),
        "detail": {
            "elapsed_s": round(elapsed, 3),
            "qps_best_pass": round(N_QUERIES / elapsed_best, 2),
            "pass_times_s": [round(t, 3) for t in times],
            "index_build_s": round(build_s, 2),
            "index_build_compile_s": round(build_compile_s, 1),
            "warmup_s": round(warm_s, 1),
            "n_queries": N_QUERIES,
            "operating_point": op_cfg,
            "index_rows": N_ROWS,
            "qps_8.8M_equivalent": round(qps_msmarco_equiv, 2),
            "topk_returned": int(rows.shape[1]),
            "kernel_smoke_max_diff": round(smoke_diff, 6),
            "encode_passages_per_sec": round(encode_pps, 1),
            "reference_cpu_qps_measured_100k_rows_1core": (
                REFERENCE_QPS_MEASURED_CPU_100K
            ),
            "vs_reference_cpu_1core_row_scaled": round(
                qps / (REFERENCE_QPS_MEASURED_CPU_100K * 100_000 / N_ROWS), 1
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
