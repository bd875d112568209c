"""bench.py stage decomposition: the roofline accounting (bytes moved,
GB/s, roofline fraction — VERDICT r4 #5) must be well-formed on the CPU
scan path so a malformed block never reaches BENCH_r{N}.json."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_stage_times_roofline(rng):
    import bench
    from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher
    from dhr_tpu.retrieval.index import PackedIndex

    N, lex, cls = 512, 12, 4
    values = (rng.random((N, lex + cls)) + 0.05).astype(np.float16)
    indices = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=lex).quantize()
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=7, mode="gip", theta=0.05, rerank=True,
                     agip_topk=32, max_important_dims=8, query_batch=4),
    )
    qv = values[:8].astype(np.float32)
    qi = indices[:8].astype(np.int32)
    stage = bench.measure_stage_times(searcher, qv, qi, n_iters=1)
    assert "roofline" in stage
    roof = stage["roofline"]
    for name in ("theta_kernel", "candidate_select", "rerank", "total"):
        assert roof[name]["bytes_moved"] >= 0
    # theta pass streams B x n_dims x N value+index bytes + the score plane
    assert roof["theta_kernel"]["bytes_moved"] == 4 * 8 * N * 2 + 4 * N * 2
    # rerank gathers pool rows from both row-major planes
    assert roof["rerank"]["bytes_moved"] == 4 * 32 * ((lex + cls) + lex)
    # CPU run: no roofline fraction against the v5e peak
    assert stage["hbm_peak_gbps"] is None
    assert "roofline_frac" not in roof["total"]


def test_load_measured_points_absent_and_present(tmp_path, monkeypatch):
    """bench detail must carry docs/measured_points.json verbatim when
    present and a note (never a failure) when absent."""
    import json

    import bench

    real = bench._load_measured_points()
    assert isinstance(real, dict)
    # the committed round-5 artifact: >=1 real on-chip point at >=2.62M
    # rows with a quadruple-digit 8.8M ip+rerank median
    pts = real.get("points", [])
    assert pts, "docs/measured_points.json should be committed with points"
    assert all("qps_median" in p and p["rows"] >= 2_621_440 for p in pts)
    assert any(p["rows"] == 8_806_400 and p["qps_median"] > 1000
               for p in pts)

    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    assert "note" in bench._load_measured_points()

    (tmp_path / "docs").mkdir()
    payload = {"points": [{"tag": "8.8M ip+rerank qb=64", "rows": 8806400,
                           "qps_median": 1.0}]}
    (tmp_path / "docs" / "measured_points.json").write_text(
        json.dumps(payload))
    assert bench._load_measured_points() == payload


def test_harvest_measured_points(tmp_path):
    """The harvest tool separates measured points from error lines and
    writes the schema bench.py ships verbatim."""
    import json
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from harvest_measured_points import harvest

    src = tmp_path / "probe.json"
    src.write_text(
        json.dumps({"tag": "8.8M ip+rerank qb=64", "rows": 8806400,
                    "qps_median": 123.4}) + "\n" +
        json.dumps({"tag": "3.69M", "error": "RESOURCE_EXHAUSTED: oom"})
        + "\n")
    dst = tmp_path / "measured_points.json"
    out = harvest(str(src), str(dst))
    assert len(out["points"]) == 1 and out["points"][0]["rows"] == 8806400
    assert len(out["errors"]) == 1
    assert json.loads(dst.read_text())["points"] == out["points"]
