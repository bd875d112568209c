"""rep_stats tool: int8-quantized npz input must be dequantized.

A quantized PackedIndex stores codes (-127..127) with per-dim
value_scales; theta statistics compared against raw codes would be
meaningless (every code >= 1 clears theta ~0.01).  The npz paths must
produce (approximately) the same statistics for the float plane and its
int8-quantized twin.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rep_stats import npz_stats  # noqa: E402

from dhr_tpu.retrieval.index import PackedIndex  # noqa: E402


def _save_world(tmp_path, pk):
    corpus = str(tmp_path / "corpus.npz")
    pk.save(corpus)
    rng = np.random.default_rng(1)
    qv = (rng.random((8, pk.values.shape[1])) * 0.6).astype(np.float32)
    qf = rng.integers(0, 4, (8, pk.lex_dim)).astype(np.int32)
    queries = str(tmp_path / "queries.npz")
    np.savez(queries, values=qv, indices=qf)
    with open(queries + ".qids.json", "w") as f:
        json.dump([f"q{i}" for i in range(8)], f)
    return corpus, queries


def test_npz_stats_dequantizes_int8(tmp_path):
    rng = np.random.default_rng(0)
    N, lex, cls = 64, 24, 8
    vals = (rng.random((N, lex + cls)) * 0.5).astype(np.float32)
    idxs = rng.integers(0, 4, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    pk_f = PackedIndex(vals, idxs, docids, lex_dim=lex)
    pk_q = pk_f.quantize()

    d_f = tmp_path / "f"
    d_q = tmp_path / "q"
    d_f.mkdir()
    d_q.mkdir()
    cf, qf_ = _save_world(d_f, pk_f)
    cq, qq = _save_world(d_q, pk_q)

    theta = 0.25
    s_f, pkf, _ = npz_stats(cf, qf_, theta, cap=16)
    s_q, pkq, _ = npz_stats(cq, qq, theta, cap=16)

    # the subsample index handed to the agreement stage keeps its scales
    assert pkq.value_scales is not None

    # dequantized statistics track the float plane closely; raw codes
    # would put EVERY nonzero value above theta (codes are integers)
    a = s_f["passage_dims_active"]["gt_theta_mean"]
    b = s_q["passage_dims_active"]["gt_theta_mean"]
    assert abs(a - b) <= max(0.05 * a, 0.5), (s_f, s_q)
    a = s_f["value_profile"]["p_active_mean"]
    b = s_q["value_profile"]["p_active_mean"]
    assert abs(a - b) <= 0.05 * a, (s_f, s_q)
    # raw-code comparison would saturate this: every code >= 1 clears 0.25
    assert b < 1.0
