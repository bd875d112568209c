"""CLI integration: densify -> index -> search -> eval through the verbs."""

import json
import os

import numpy as np
import pytest

from dhr_tpu.cli.main import main


def test_densify_index_search_eval_pipeline(tmp_path, rng):
    # sparse vectors for 30 docs over a 500-term bm25 vocab (omission 472)
    vecs = tmp_path / "vectors.jsonl"
    with open(vecs, "w") as f:
        for i in range(30):
            terms = rng.choice(np.arange(472, 500), 6, replace=False)
            vector = {str(int(t)): float(rng.random() + 0.1) for t in terms}
            f.write(json.dumps({"id": f"d{i}", "vector": vector}) + "\n")

    shard = str(tmp_path / "shard0.npz")
    main(["densify", "--input", str(vecs), "--output", shard,
          "--weight-model", "bm25", "--dim", "4", "--vocab-size", "500"])
    assert os.path.exists(shard)

    merged = str(tmp_path / "index.npz")
    main(["index", "--inputs", str(tmp_path / "shard*.npz"),
          "--output", merged])

    # queries: reuse two docs' vectors
    qnpz = str(tmp_path / "queries.npz")
    from dhr_tpu.retrieval import PackedIndex

    packed = PackedIndex.load(merged)
    np.savez(qnpz, values=packed.values[:2].astype(np.float32),
             indices=packed.indices[:2].astype(np.int32))
    with open(qnpz + ".qids.json", "w") as f:
        json.dump(["q0", "q1"], f)

    run = str(tmp_path / "result.trec")
    main(["search", "--index-path", merged, "--query-path", qnpz,
          "--output", run, "--brute-force", "--topk", "5",
          "--query-batch", "2"])
    lines = open(run).read().splitlines()
    assert lines, "run file empty"
    # identical sparse vector => self-match ranks first (exact GIP self-score
    # dominates because gates all agree)
    top = {ln.split()[0]: ln.split()[2] for ln in lines
           if ln.split()[3] == "1"}
    assert top["q0"] == "d0" and top["q1"] == "d1"

    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("q0 0 d0 1\nq1 0 d1 1\n")
    main(["eval", "--qrels", str(qrels), "--run", run])


def test_merge_runs_cli(tmp_path):
    from dhr_tpu.retrieval import read_run, write_run

    a, b = str(tmp_path / "r0.trec"), str(tmp_path / "r1.trec")
    write_run(a, {"q": ["d1"]}, {"q": [9.0]})
    write_run(b, {"q": ["d2"]}, {"q": [5.0]})
    out = str(tmp_path / "merged.trec")
    main(["merge-runs", "--inputs", str(tmp_path / "r*.trec"),
          "--output", out, "--topk", "10"])
    assert list(read_run(out)["q"]) == ["d1", "d2"]


def test_sharded_search_cli_with_merge(tmp_path, rng):
    """--total-shard/--shard parity: shard runs then merge equals full run."""
    from dhr_tpu.retrieval import PackedIndex, read_run

    values = (rng.random((40, 8)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (40, 8)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(40)], dtype=object)
    PackedIndex(values, indices, docids, lex_dim=8).save(
        str(tmp_path / "index.npz")
    )
    qnpz = str(tmp_path / "q.npz")
    np.savez(qnpz, values=values[:2].astype(np.float32),
             indices=indices[:2].astype(np.int32))
    with open(qnpz + ".qids.json", "w") as f:
        json.dump(["q0", "q1"], f)

    full = str(tmp_path / "full.trec")
    main(["search", "--index-path", str(tmp_path / "index.npz"),
          "--query-path", qnpz, "--output", full, "--brute-force",
          "--topk", "10", "--query-batch", "2"])
    for s in range(2):
        main(["search", "--index-path", str(tmp_path / "index.npz"),
              "--query-path", qnpz,
              "--output", str(tmp_path / f"part{s}.trec"), "--brute-force",
              "--topk", "10", "--query-batch", "2",
              "--total-shard", "2", "--shard", str(s)])
    merged = str(tmp_path / "m.trec")
    main(["merge-runs", "--inputs", str(tmp_path / "part*.trec"),
          "--output", merged, "--topk", "10"])
    assert list(read_run(merged)["q0"]) == list(read_run(full)["q0"])


def test_config_file_overrides(tmp_path, rng):
    """--config JSON supplies defaults; explicit CLI flags win."""
    import json as _json

    from dhr_tpu.retrieval import PackedIndex

    values = (rng.random((16, 8)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (16, 8)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(16)], dtype=object)
    PackedIndex(values, indices, docids, lex_dim=8).save(
        str(tmp_path / "index.npz")
    )
    qnpz = str(tmp_path / "q.npz")
    np.savez(qnpz, values=values[:1].astype(np.float32),
             indices=indices[:1].astype(np.int32))
    with open(qnpz + ".qids.json", "w") as f:
        _json.dump(["q0"], f)
    cfg = tmp_path / "cfg.json"
    cfg.write_text(_json.dumps({
        "topk": 3, "brute-force": True, "query-batch": 1,
        "output": str(tmp_path / "from_cfg.trec"),
    }))
    main(["search", "--index-path", str(tmp_path / "index.npz"),
          "--query-path", qnpz, "--config", str(cfg)])
    lines = open(tmp_path / "from_cfg.trec").read().splitlines()
    assert len(lines) == 3  # topk from the config file


def test_search_reads_reference_query_pickle(tmp_path, rng):
    import pickle

    from dhr_tpu.retrieval import PackedIndex, read_run

    values = (rng.random((20, 8)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (20, 8)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(20)], dtype=object)
    PackedIndex(values, indices, docids, lex_dim=8).save(
        str(tmp_path / "index.npz")
    )
    qp = str(tmp_path / "queries.pt")
    with open(qp, "wb") as f:
        pickle.dump([values[:2].astype(np.float16),
                     indices[:2].astype(np.int16), ["q0", "q1"]], f)
    run = str(tmp_path / "r.trec")
    main(["search", "--index-path", str(tmp_path / "index.npz"),
          "--query-path", qp, "--output", run, "--brute-force",
          "--topk", "4", "--query-batch", "2"])
    out = read_run(run)
    assert list(out["q0"])[0] == "d0"
