"""Convert a big-index probe's JSONL stdout into docs/measured_points.json.

The round-5 big probe (`.tmp/probe_big_r5.py`) prints one JSON object per
measured operating point (tag, rows, qps_median/best, pass times, timing
decomposition).  bench.py ships docs/measured_points.json verbatim in its
detail block (``measured_large_index``) so the extrapolated
``qps_8.8M_equivalent`` figure always travels next to a real >=large-row
measurement (VERDICT r4 #4).

Usage: python tools/harvest_measured_points.py probe.json [more.json ...]
"""
from __future__ import annotations

import json
import os
import sys


def harvest(srcs, dst: str | None = None) -> dict:
    if isinstance(srcs, str):
        srcs = [srcs]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = dst or os.path.join(repo, "docs", "measured_points.json")
    points, errors = [], []
    for src in srcs:
        with open(src) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                (errors if "error" in obj else points).append(obj)
    if not points and not errors:
        raise SystemExit(f"{srcs}: no JSON lines found")
    out = {
        "provenance": (
            "one v5e chip through the axon relay; synthetic trained-rep-"
            "statistics planes (dhr_tpu/retrieval/synth.py) built on "
            "device; source artifacts "
            + ", ".join(os.path.basename(s) for s in srcs)
        ),
        "points": points,
    }
    if errors:
        out["errors"] = errors
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    return out


if __name__ == "__main__":
    srcs = sys.argv[1:] or [".tmp/probe_big_r5.json"]
    result = harvest(srcs)
    print(json.dumps(
        {"points": len(result["points"]),
         "errors": len(result.get("errors", []))}))
