"""Render pipeline_rehearsal.py JSON report(s) as docs/pipeline_run.md.

Usage:
  python tools/render_pipeline_run.py .tmp/pipeline_full.json [more.json ...] \
      > docs/pipeline_run.md

Multiple reports render as one document with a section per corpus scale.
"""

from __future__ import annotations

import json
import sys

METRICS = ["MRR@10", "nDCG@10", "Recall@10", "MRR@100", "nDCG@100",
           "Recall@100", "Recall@1000"]


def fmt(x):
    return f"{x:.4f}" if isinstance(x, float) else str(x)


def render_one(r, out, depth="##"):
    cfg = r["config"]
    family = cfg.get("family", "dhr")
    staged = "staged" in r["untrained"]
    out.append(f"{depth} Setup")
    out.append("")
    out.append(f"- corpus: **{cfg['n_corpus']:,} passages** (synthetic "
               f"topical wordpiece world, {cfg['n_topics']} topics, real "
               "vocab 30522/omission 570, MARCO-like lengths)")
    out.append(f"- train: {cfg['n_train']} queries x 8 passages/group "
               "(1 source positive + same-topic hard negatives + random), "
               f"{cfg['max_steps']} packed steps, lr {cfg['lr']}")
    out.append(f"- dev: {cfg['n_dev']} held-out queries, qrel = source "
               "passage")
    out.append(f"- model: {cfg['model']}, family **{family}**")
    if staged:
        out.append(f"- staged search: theta={cfg['theta']} (auto-calibrated "
                   "per checkpoint so the median query scans ~40 dims), "
                   f"rerank@{cfg['agip_topk']}, scan cap 48 dims")
    elif family == "colbert":
        out.append("- search: exact full-ranking MaxSim over token reps "
                   "(colbert-score --full-ranking; beyond the reference, "
                   "which only scores candidate pairs)")
    else:
        out.append("- search: exact IP (the reference's operating point "
                   "for this family)")
    out.append("")
    out.append(f"{depth} Quality: untrained vs trained, staged vs exact")
    out.append("")
    modes = ("staged", "exact") if staged else ("exact",)
    cols = " | ".join(f"{t} {m}" for t in ("untrained", "trained")
                      for m in modes)
    out.append(f"| metric | {cols} |")
    out.append("|---|" + "---|" * 2 * len(modes))
    for m in METRICS:
        row = [m]
        for tag in ("untrained", "trained"):
            for mode in modes:
                row.append(fmt(r[tag][mode].get(m, "-")))
        out.append("| " + " | ".join(row) + " |")
    out.append("")
    mrr_u = r["untrained"]["exact"]["MRR@10"]
    mrr_t = r["trained"]["exact"]["MRR@10"]
    out.append(f"- **learn-to-retrieve holds at scale**: exact MRR@10 "
               f"{fmt(mrr_u)} -> {fmt(mrr_t)} "
               f"({mrr_t / max(mrr_u, 1e-9):.1f}x; `mrr_improves="
               f"{r['mrr_improves']}`) — the scale-up of "
               "tests/test_e2e_learning.py's assertion, on hardware.")
    out.append(f"- train loss {r['train_loss_first']:.3f} -> "
               f"{r['train_loss_last']:.3f} over {cfg['max_steps']} steps.")
    for tag in ("untrained", "trained"):
        q = r[tag]
        if "theta" not in q:
            continue
        th = q.get("theta")
        above = q.get("query_dims_above_theta", {})
        out.append(f"- {tag}: theta {th}, query dims above theta "
                   f"mean {above.get('mean')} / max {above.get('max')}.")
    out.append("")
    out.append(f"{depth} Per-verb wall-clock")
    out.append("")
    out.append("| verb | wall s |")
    out.append("|---|---|")
    for t in r["timings"]:
        out.append(f"| {t['verb']} | {t['wall_s']} |")
    out.append(f"| **total** | **{r['total_wall_s']}** |")
    out.append("")
    out.append("Wall-clock includes per-verb process start + jit/remote "
               "compile (fresh shapes each stage); the measured steady-state "
               "device rates for every verb are in docs/design.md.")


def main():
    reports = []
    for path in sys.argv[1:]:
        with open(path) as f:
            reports.append(json.load(f))
    reports.sort(key=lambda r: r["config"]["n_corpus"])
    out = []
    out.append("# Full-pipeline dress rehearsal on hardware")
    out.append("")
    out.append("One scripted run of the whole user-facing loop — "
               "`train -> encode (--pack) -> index (int8) -> search "
               "(theta+rerank AND exact GIP) -> eval` — through the CLI "
               "verbs (tools/pipeline_rehearsal.py; VERDICT r3 item 3). "
               "The reference's documented pipeline is "
               "`/root/reference/docs/dhr/msmarco-passage-train-eval.md`.")
    out.append("")
    if len(reports) == 1:
        render_one(reports[0], out)
    else:
        for r in reports:
            fam = r["config"].get("family", "dhr")
            mode = "exact MaxSim" if fam == "colbert" else "exact IP"
            suffix = "" if fam == "dhr" else f" — {fam} family ({mode})"
            out.append(f"## At {r['config']['n_corpus']:,} passages{suffix}")
            out.append("")
            render_one(r, out, depth="###")
            out.append("")
    print("\n".join(out))


if __name__ == "__main__":
    main()
