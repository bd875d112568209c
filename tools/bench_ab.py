"""Whole-bench interleaved A/B harness (pinned-relay-day comparisons).

Relay throughput drifts across hours/days (docs/design.md "Measured"
records the same code at 971 and 1160 q/s on different relay days), so
back-to-back *separate* bench runs routinely fake sub-10% "wins" — the
round-4 one-factor sweep showed unroll=4 beating unroll=8 by 8.5% where
an interleaved pass-by-pass A/B measured a tie.  This tool generalizes
that interleaved protocol from single-kernel probes to the WHOLE bench
operating point:

- the bench index (retrieval/synth.py trained-rep statistics, same seed
  and scale as bench.py) is built ONCE and shared by both configs;
- config A and config B are the bench operating point plus explicit
  ``key=value`` overrides onto :class:`SearchConfig`;
- timed passes run in ABBA order (pair 0: A then B; pair 1: B then A;
  ...) inside one process, so linear drift cancels within pairs and
  slow-relay minutes hit both arms;
- the verdict is the **median paired speedup** plus the win count —
  never a cross-run ratio.

The standing protocol (CLAUDE.md): any sweep delta under ~10% must be
confirmed here before flipping a default.

Usage::

  python tools/bench_ab.py --b pallas_unroll=4            # vs defaults
  python tools/bench_ab.py --a agip_topk=10000 --b agip_topk=2000 \
      --pairs 5 --out .tmp/ab_pool.json

Prints one JSON document; quality guardrail = final-ranking overlap
between the two arms (an arm that is "faster" by returning different
results is flagged, not crowned).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def log(*a):
    print("[bench_ab]", *a, file=sys.stderr, flush=True)


def _coerce(field: dataclasses.Field, raw: str):
    """Parse a CLI override onto a SearchConfig field, directed by the
    field's declared type (plain or union: bool|str, int|str, int|None).

    A value whose form is not admitted by the annotation is a CLI error
    (SystemExit), not a silently malformed config — e.g. a numeric
    string for a str-only field stays a string, and 'none' is rejected
    for non-optional fields.
    """
    ann = str(field.type)
    low = raw.lower()

    def admits(token):
        return token in ann

    if low in ("true", "false"):
        if not admits("bool"):
            raise SystemExit(
                f"field '{field.name}' ({ann}) does not take a bool: {raw!r}")
        return low == "true"
    if low in ("none", "null"):
        if not (admits("None") or admits("Optional")):
            raise SystemExit(
                f"field '{field.name}' ({ann}) is not optional: {raw!r}")
        return None
    for token, cast in (("int", int), ("float", float)):
        if admits(token):
            try:
                return cast(raw)
            except ValueError:
                continue
    if admits("float"):  # int literal onto a float field
        try:
            return float(raw)
        except ValueError:
            pass
    if admits("str"):
        return raw
    raise SystemExit(
        f"cannot parse {raw!r} for field '{field.name}' ({ann})")


def parse_overrides(pairs, cfg_cls):
    fields = {f.name: f for f in dataclasses.fields(cfg_cls)}
    out = {}
    for item in pairs or ():
        if "=" not in item:
            raise SystemExit(f"override '{item}' is not key=value")
        key, raw = item.split("=", 1)
        if key not in fields:
            raise SystemExit(
                f"unknown SearchConfig field '{key}'; valid: "
                + ", ".join(sorted(fields)))
        out[key] = _coerce(fields[key], raw)
    return out


def overlap(rows_a, rows_b, k):
    vals = [
        len(set(a[:k].tolist()) & set(b[:k].tolist())) / k
        for a, b in zip(rows_a, rows_b)
    ]
    return round(float(np.mean(vals)), 4)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", action="append", default=[],
                    help="key=value SearchConfig override for arm A "
                    "(repeatable); base = the bench operating point")
    ap.add_argument("--b", action="append", default=[],
                    help="key=value override for arm B (repeatable)")
    ap.add_argument("--rows", type=int, default=1_638_400)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--pairs", type=int, default=5,
                    help="ABBA pass pairs per arm")
    ap.add_argument("--seed", type=int, default=0,
                    help="world seed (bench.py uses 0)")
    ap.add_argument("--query-batch", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher
    from dhr_tpu.retrieval.synth import (
        SynthConfig, synth_index_planes, synth_reps,
    )

    base = SearchConfig(
        topk=1000, mode="gip", theta=0.3, rerank=True, agip_topk=10000,
        max_important_dims=48, query_batch=args.query_batch, pallas_unroll=8,
    )
    cfg_a = dataclasses.replace(base, **parse_overrides(args.a, SearchConfig))
    cfg_b = dataclasses.replace(base, **parse_overrides(args.b, SearchConfig))
    if cfg_a == cfg_b:
        log("WARNING: arm A == arm B (measuring pure pass noise)")

    scfg = SynthConfig()
    lex = scfg.lex_dim
    log(f"building shared index: {args.rows} rows ...")
    t0 = time.perf_counter()
    v_i8, folds, scales, _ = synth_index_planes(
        jax.random.PRNGKey(args.seed), args.rows, scfg, n_chunks=16)
    docids = np.arange(args.rows).astype(str).astype(object)
    index = DeviceIndex.from_arrays(
        v_i8, folds, docids, lex_dim=lex, value_scales=scales)
    jax.block_until_ready(index.values_T)
    log(f"index built in {time.perf_counter() - t0:.1f}s")

    qv, qf, _ = synth_reps(
        jax.random.PRNGKey(args.seed), args.queries, scfg, "query", stream=1)
    qv = np.asarray(qv, np.float32)
    qf = np.asarray(qf, np.int32)

    arms = {"a": Searcher(index, cfg_a), "b": Searcher(index, cfg_b)}
    rows_by_arm = {}
    for name, s in arms.items():  # warmup/compile + quality capture
        t0 = time.perf_counter()
        scores, rows = s.search(qv, qf)
        _ = float(scores[-1, -1])
        rows_by_arm[name] = rows
        log(f"arm {name} warm in {time.perf_counter() - t0:.1f}s")

    def timed(name):
        s = arms[name]
        t0 = time.perf_counter()
        scores, _ = s.search(qv, qf)
        _ = float(scores[-1, -1])
        return time.perf_counter() - t0

    pass_times = {"a": [], "b": []}
    for pair in range(args.pairs):
        order = ("a", "b") if pair % 2 == 0 else ("b", "a")
        for name in order:
            dt = timed(name)
            pass_times[name].append(dt)
            log(f"pair {pair} arm {name}: {dt:.3f}s "
                f"({args.queries / dt:.1f} q/s)")

    ta = np.array(pass_times["a"])
    tb = np.array(pass_times["b"])
    paired_speedup = ta / tb  # >1 means B faster, per pair
    result = {
        "protocol": "interleaved ABBA whole-bench pairs, shared index",
        "rows": args.rows,
        "queries": args.queries,
        "pairs": args.pairs,
        "arm_a": {k: str(v) for k, v in sorted(
            parse_overrides(args.a, SearchConfig).items())} or "bench-default",
        "arm_b": {k: str(v) for k, v in sorted(
            parse_overrides(args.b, SearchConfig).items())} or "bench-default",
        "qps_a_median": round(args.queries / float(np.median(ta)), 2),
        "qps_b_median": round(args.queries / float(np.median(tb)), 2),
        "pass_times_a_s": [round(t, 3) for t in ta],
        "pass_times_b_s": [round(t, 3) for t in tb],
        "paired_speedup_b_over_a": [round(x, 4) for x in paired_speedup],
        "median_paired_speedup_b_over_a": round(
            float(np.median(paired_speedup)), 4),
        "b_wins_pairs": int((paired_speedup > 1.0).sum()),
        "ranking_overlap_a_vs_b": {
            f"@{k}": overlap(rows_by_arm["a"], rows_by_arm["b"],
                             min(k, rows_by_arm["a"].shape[1]))
            for k in (10, 100, 1000)
        },
    }
    sp = result["median_paired_speedup_b_over_a"]
    result["verdict"] = (
        "tie (within pass noise)" if abs(sp - 1.0) <= 0.02
        else f"B {'faster' if sp > 1 else 'slower'} by "
        f"{abs(sp - 1) * 100:.1f}% (median paired)"
    )
    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
