"""Headline benchmark: GIP retrieval queries/sec on one TPU chip.

Operating point = the reference's documented best-quality configuration
(docs/dhr/msmarco-passage-train-eval.md:114-125): theta=0.3 approximate GIP
with exact-GIP rerank of the top agip_topk=10000, final top-k 1000, index
dtypes f16 values (768 DLR dims + 128 CLS dims) + uint8 argmax indices.

Index: synthetic 2M-passage index with realistic value/index statistics
(softmax-weighted lexical values are sparse-positive; argmax folds uniform
over 39).  2M rows is what fits one v5e chip with both row- and dim-major
planes resident; the JSON also reports the 8.8M-corpus-equivalent rate
(bandwidth-proportional) for comparison against MS MARCO-scale numbers.

vs_baseline: measured q/s divided by 100 q/s — our estimate of the reference
GPU engine at the same operating point on the full 8.8M index.  The reference
publishes no throughput numbers (SURVEY.md section 6); 100 q/s is generous to
it: its per-query loop gathers ~30 important columns from row-major arrays
(~0.8 GB strided reads/query) plus a 10k-candidate rerank, which bounds it
to low hundreds of q/s on an A100-class part before Python overhead.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

N_ROWS = 2_000_000
LEX_DIM = 768
CLS_DIM = 128
N_QUERIES = 256
QUERY_BATCH = 64
THETA = 0.3
MAX_IMPORTANT = 48
REFERENCE_QPS_ESTIMATE = 100.0  # see module docstring
REFERENCE_CORPUS_ROWS = 8_841_823


def synth_index(rng, n_rows):
    from dhr_tpu.retrieval import PackedIndex

    # sparse-positive values: most dims tiny, a few large (softmax x weight)
    raw = rng.gamma(shape=0.3, scale=1.0, size=(n_rows, LEX_DIM)).astype(
        np.float32
    )
    cls = rng.standard_normal((n_rows, CLS_DIM)).astype(np.float32) * 0.3
    values = np.concatenate([raw, cls], axis=1).astype(np.float16)
    indices = rng.integers(0, 39, (n_rows, LEX_DIM)).astype(np.uint8)
    docids = np.arange(n_rows).astype(str).astype(object)
    return PackedIndex(values, indices, docids, lex_dim=LEX_DIM)


def synth_queries(rng, n):
    qv = rng.gamma(shape=0.3, scale=1.0, size=(n, LEX_DIM)).astype(np.float32)
    qc = rng.standard_normal((n, CLS_DIM)).astype(np.float32) * 0.3
    qi = rng.integers(0, 39, (n, LEX_DIM)).astype(np.int32)
    return np.concatenate([qv, qc], axis=1), qi


def main():
    from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher

    rng = np.random.default_rng(0)
    packed = synth_index(rng, N_ROWS)
    index = DeviceIndex.from_packed(packed)
    searcher = Searcher(
        index,
        SearchConfig(
            topk=1000, mode="gip", theta=THETA, rerank=True, agip_topk=10000,
            max_important_dims=MAX_IMPORTANT, query_batch=QUERY_BATCH,
        ),
    )
    qv, qi = synth_queries(rng, N_QUERIES)

    # warmup (compile both stages)
    searcher.search(qv[:QUERY_BATCH], qi[:QUERY_BATCH])

    start = time.perf_counter()
    scores, rows = searcher.search(qv, qi)
    elapsed = time.perf_counter() - start

    qps = N_QUERIES / elapsed
    qps_msmarco_equiv = qps * N_ROWS / REFERENCE_CORPUS_ROWS
    result = {
        "metric": "GIP queries/sec, 1 chip, 2M-passage index, theta=0.3+rerank",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps_msmarco_equiv / REFERENCE_QPS_ESTIMATE, 3),
        "detail": {
            "elapsed_s": round(elapsed, 3),
            "n_queries": N_QUERIES,
            "index_rows": N_ROWS,
            "qps_8.8M_equivalent": round(qps_msmarco_equiv, 2),
            "topk_sanity": int(rows.shape[1]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
