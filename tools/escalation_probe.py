"""Re-judge two-tier escalation on the trained-rep-statistics distribution.

Run: python tools/escalation_probe.py   (CPU-only, ~1 min with a warm
jax cache; prints one JSON object).  Round-4 measured result and the
verdict live in docs/design.md ("Two-tier candidate escalation").

Original framing
(VERDICT r3 next #5).  Round 3 measured escalation CANNOT separate good
from bad queries on the old i.i.d. exp(-4u) generator (design.md); this
probe repeats that measurement on the realistic generator the bench now
uses (dhr_tpu/retrieval/synth.py), scale-matched exactly like the r3
probe: 204.8k rows, topk 125 (= 1000 * 204.8k/1.64M), full pool 1250
(10x), small pools 500 (4x) and 250 (2x).

Decision rule (VERDICT #5): if margins separate (calibrated margin
escalates a small fraction while recovering ~all missing-row mass),
measure the e2e win on-chip next; else mark the feature experimental in
CLI help.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dhr_tpu.retrieval import DeviceIndex  # noqa: E402
from dhr_tpu.retrieval.searcher import SearchConfig, Searcher  # noqa: E402
from dhr_tpu.retrieval.synth import (  # noqa: E402
    SynthConfig,
    synth_index_planes,
    synth_reps,
)

N_ROWS = 204_800
TOPK = 125
FULL_POOL = 1250
LEX_DIM = 768
N_QUERIES = 256

t0 = time.time()
v_i8, folds, scales, _ = synth_index_planes(
    jax.random.PRNGKey(0), N_ROWS, SynthConfig(), n_chunks=16
)
docids = np.arange(N_ROWS).astype(str).astype(object)
idx = DeviceIndex.from_arrays(
    v_i8, folds, docids, lex_dim=LEX_DIM, value_scales=scales
)
qv, qf, _ = synth_reps(
    jax.random.PRNGKey(0), N_QUERIES, SynthConfig(), "query", stream=1
)
qv = np.asarray(qv, np.float32)
qf = np.asarray(qf, np.int32)
print(f"index+queries built in {time.time() - t0:.1f}s", file=sys.stderr)

report = {"n_rows": N_ROWS, "topk": TOPK, "full_pool": FULL_POOL,
          "n_queries": N_QUERIES, "distribution": "trained-rep (synth.py)"}
for pool in (500, 250):
    cfg = SearchConfig(
        topk=TOPK, theta=0.3, rerank=True, agip_topk=FULL_POOL,
        max_important_dims=48, query_batch=64,
        escalate_pool=pool, escalate_margin=0.0,
    )
    s = Searcher(idx, cfg)
    t0 = time.time()
    cal = s.calibrate_escalation(qv, qf, miss_mass_target=0.95)
    cal["calibrate_s"] = round(time.time() - t0, 1)
    report[f"pool_{pool}"] = cal
    print(f"pool={pool}: {json.dumps(cal)}", file=sys.stderr)

print(json.dumps(report))
