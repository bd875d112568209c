"""Recall@k comparison of index compression modes vs exact GIP.

Emits the int8 / PQ64 / f16(bf16) comparison table (VERDICT round-1 item 4):
same synthetic value distribution as bench.py, candidates from each
compressed representation, exact-GIP rerank on top, recall measured against
the exact full-precision GIP top-k.

Run CPU-small (default) or TPU-size with --rows/--queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--lex", type=int, default=768)
    ap.add_argument("--cls", type=int, default=128)
    ap.add_argument("--topk", type=int, default=100)
    ap.add_argument("--agip-topk", type=int, default=1000)
    ap.add_argument("--pq-m", type=int, default=64)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dhr_tpu.retrieval import DeviceIndex, PackedIndex, SearchConfig, Searcher

    rng = np.random.default_rng(0)
    # clustered corpus: each query's exact top-k is its cluster, a ranking
    # with real signal that a good approximation should recover (an
    # uncorrelated random corpus makes "exact top-k" a noise ranking no
    # approximation could recover — uninformative for a recall comparison)
    n_clusters = max(args.rows // 100, 8)
    proto_lex = np.exp(-3.0 * rng.random((n_clusters, args.lex), np.float32))
    proto_cls = (rng.standard_normal((n_clusters, args.cls)) * 0.5).astype(
        np.float32)
    proto_idx = rng.integers(0, 39, (n_clusters, args.lex))
    member = rng.integers(0, n_clusters, args.rows)
    lex = proto_lex[member] * rng.uniform(0.7, 1.3, (args.rows, args.lex))
    cls = proto_cls[member] + rng.standard_normal(
        (args.rows, args.cls)).astype(np.float32) * 0.1
    indices = proto_idx[member]
    flip = rng.random((args.rows, args.lex)) < 0.1
    indices = np.where(flip, rng.integers(0, 39, indices.shape),
                       indices).astype(np.uint8)
    values = np.concatenate(
        [lex, cls], axis=1).astype(np.float16)
    docids = np.asarray([str(i) for i in range(args.rows)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=args.lex)

    q_cluster = rng.choice(n_clusters, args.queries, replace=False)
    qlex = proto_lex[q_cluster] * rng.uniform(
        0.8, 1.2, (args.queries, args.lex))
    qcls = proto_cls[q_cluster] + rng.standard_normal(
        (args.queries, args.cls)) * 0.05
    qv = np.concatenate([qlex, qcls], axis=1).astype(np.float32)
    qi = proto_idx[q_cluster].astype(np.int32)

    import jax.numpy as jnp

    def run(packed_idx, mode, value_dtype=None, theta=0.0,
            approx=False, slices=1):
        searcher = Searcher(
            DeviceIndex.from_packed(packed_idx, value_dtype=value_dtype),
            SearchConfig(
                topk=args.topk, mode=mode, theta=theta, rerank=True,
                agip_topk=min(args.agip_topk, args.rows),
                max_important_dims=48,
                query_batch=args.queries, approx_candidates=approx,
                candidate_slices=slices,
            ),
        )
        _, rows = searcher.search(qv, qi)
        return np.asarray(rows)

    # exact baseline: brute-force GIP in f32
    exact_rows = run(packed, "gip", value_dtype=jnp.float32, theta=0.0)

    bytes_per_row = {
        "f16/bf16 planes": args.lex + args.cls * 2 + args.lex,  # v f16 + i u8
        "int8 planes": args.lex + args.cls + args.lex,
        f"PQ{args.pq_m} codes (stage 1)": args.pq_m,
    }
    # stratified rows: on CPU approx_max_k falls back to exact per slice,
    # so these isolate the slice-edge effect of the serving default
    bytes_per_row["int8 + stratified S=8 candidates"] = (
        bytes_per_row["int8 planes"])
    configs = {
        "f16/bf16 planes": lambda: run(packed, "gip", theta=0.3),
        "int8 planes": lambda: run(packed.quantize(), "gip", theta=0.3),
        "int8 + stratified S=8 candidates": lambda: run(
            packed.quantize(), "gip", theta=0.3, approx=True, slices=8),
        f"PQ{args.pq_m} codes (stage 1)": lambda: run(
            packed.quantize_pq(m=args.pq_m, iters=15), "pq"),
    }
    table = {}
    for name, fn in configs.items():
        rows = fn()
        recall = np.mean([
            len(set(rows[b]) & set(exact_rows[b])) / args.topk
            for b in range(args.queries)
        ])
        table[name] = {
            "recall_at_k_vs_exact": round(float(recall), 4),
            "candidate_bytes_per_row": bytes_per_row[name],
        }
        print(f"{name:28s} recall@{args.topk} = {recall:.4f}  "
              f"({bytes_per_row[name]} B/row stage-1 reads)", file=sys.stderr)
    print(json.dumps({
        "rows": args.rows, "queries": args.queries, "topk": args.topk,
        "operating_point": "theta=0.3+rerank (gip) / ADC+rerank (pq)",
        "modes": table,
    }))


if __name__ == "__main__":
    main()
