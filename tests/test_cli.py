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

    # --fused-candidates plumbs through and degrades gracefully off-TPU
    # (pallas_ok is False on the CPU backend, so the searcher falls back to
    # the plain path; results must be unchanged)
    run2 = str(tmp_path / "result_fused.trec")
    main(["search", "--index-path", merged, "--query-path", qnpz,
          "--output", run2, "--theta", "0.0", "--rerank", "--topk", "5",
          "--query-batch", "2", "--fused-candidates", "auto",
          "--candidate-block", "8"])
    assert open(run2).read().splitlines()


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


def test_full_cli_pipeline_train_encode_search_eval(tmp_path, rng):
    """The whole flow through the CLI verbs with a --tiny model."""
    import json as _json

    from dhr_tpu.data.examples import write_jsonl

    vocab, remove, dlr = 70, 6, 8
    corpus_rows = [
        {"text_id": f"d{i}",
         "text": rng.integers(2, vocab, 8).tolist()}
        for i in range(24)
    ]
    corpus_path = str(tmp_path / "corpus.jsonl")
    write_jsonl(corpus_path, corpus_rows)
    groups = [
        {"query": corpus_rows[i]["text"][:4],
         "positive_pids": [str(i)],
         "negative_pids": [str((i + 5) % 24), str((i + 9) % 24)]}
        for i in range(16)
    ]
    train_path = str(tmp_path / "train.jsonl")
    write_jsonl(train_path, groups)

    out_dir = str(tmp_path / "run")
    common = ["--model", "dhr", "--tiny", "--tiny-vocab", str(vocab),
              "--add-pooler", "--projection-dim", "4",
              "--dlr-out-dim", str(dlr), "--remove-dims", str(remove),
              "--cls-token-id", "1", "--sep-token-id", "0",
              "--q-max-len", "6", "--p-max-len", "10"]
    main(["train", *common, "--train-path", train_path,
          "--corpus-path", corpus_path, "--output-dir", out_dir,
          "--train-n-passages", "2", "--batch-size", "8",
          "--num-epochs", "1", "--learning-rate", "1e-3",
          "--warmup-steps", "1", "--log-steps", "1",
          "--save-steps", "100"])
    import os

    assert os.path.exists(os.path.join(out_dir, "export", "pytorch_model.bin"))

    idx_path = str(tmp_path / "index.npz")
    main(["encode", *common, "--model-name-or-path", os.path.join(out_dir, "export"),
          "--input", corpus_path, "--output", idx_path, "--batch-size", "8"])
    q_path = str(tmp_path / "q.npz")
    main(["encode", *common, "--model-name-or-path", os.path.join(out_dir, "export"),
          "--input", corpus_path, "--encode-is-qry",
          "--output", q_path, "--batch-size", "8"])

    run_path = str(tmp_path / "run.trec")
    main(["search", "--index-path", idx_path, "--query-path", q_path,
          "--output", run_path, "--brute-force", "--topk", "5",
          "--query-batch", "8"])
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("\n".join(f"d{i} 0 d{i} 1" for i in range(24)) + "\n")
    main(["eval", "--qrels", str(qrels), "--run", run_path])


def test_cli_tct_training(tmp_path, rng):
    """--tct --teacher-path: DHR student distilled from a ColBERT teacher."""
    import os

    from dhr_tpu.data.examples import write_jsonl

    vocab = 70
    groups = [
        {"query": rng.integers(2, vocab, 4).tolist(),
         "positives": [rng.integers(2, vocab, 6).tolist()],
         "negatives": [rng.integers(2, vocab, 6).tolist()]}
        for _ in range(8)
    ]
    train_path = str(tmp_path / "train.jsonl")
    write_jsonl(train_path, groups)

    # teacher: train a tiny colbert for one step and export
    t_dir = str(tmp_path / "teacher")
    common = ["--tiny", "--tiny-vocab", str(vocab), "--add-pooler",
              "--projection-dim", "4", "--dlr-out-dim", "8",
              "--remove-dims", "6", "--cls-token-id", "1",
              "--sep-token-id", "0", "--q-max-len", "6", "--p-max-len", "8"]
    main(["train", "--model", "colbert", *common,
          "--train-path", train_path, "--output-dir", t_dir,
          "--train-n-passages", "2", "--batch-size", "8",
          "--num-epochs", "1", "--learning-rate", "1e-3",
          "--log-steps", "10", "--save-steps", "100"])
    # colbert has no MLM head -> no HF export; teacher loads from a DHR-style
    # export instead: use a dhr run's export as the teacher backbone
    s_dir = str(tmp_path / "dhr_seed")
    main(["train", "--model", "dhr", *common,
          "--train-path", train_path, "--output-dir", s_dir,
          "--train-n-passages", "2", "--batch-size", "8",
          "--num-epochs", "1", "--learning-rate", "1e-3",
          "--log-steps", "10", "--save-steps", "100"])
    teacher_export = os.path.join(s_dir, "export")
    assert os.path.exists(os.path.join(teacher_export, "pytorch_model.bin"))

    out_dir = str(tmp_path / "student")
    main(["train", "--model", "dhr", *common,
          "--train-path", train_path, "--output-dir", out_dir,
          "--train-n-passages", "2", "--batch-size", "8",
          "--num-epochs", "1", "--learning-rate", "1e-3",
          "--log-steps", "10", "--save-steps", "100",
          "--tct", "--teacher-path", teacher_export])
    assert os.path.exists(os.path.join(out_dir, "export", "pytorch_model.bin"))


def test_encode_length_bucketing_matches_plain(tmp_path, rng):
    """--length-bucketing: same reps/docids as the pad-to-max path, any order."""
    from dhr_tpu.data.examples import write_jsonl
    from dhr_tpu.retrieval import PackedIndex

    vocab = 70
    # variable-length docs spanning several buckets under p_max_len 40
    corpus_rows = [
        {"text_id": f"d{i}",
         "text": rng.integers(2, vocab, int(rng.integers(3, 39))).tolist()}
        for i in range(20)
    ]
    corpus_path = str(tmp_path / "corpus.jsonl")
    write_jsonl(corpus_path, corpus_rows)

    common = ["--model", "dhr", "--tiny", "--tiny-vocab", str(vocab),
              "--add-pooler", "--projection-dim", "4",
              "--dlr-out-dim", "8", "--remove-dims", "6",
              "--cls-token-id", "1", "--sep-token-id", "0",
              "--q-max-len", "6", "--p-max-len", "40",
              "--input", corpus_path, "--batch-size", "4"]
    plain, bucketed = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    main(["encode", *common, "--output", plain])
    main(["encode", *common, "--output", bucketed, "--length-bucketing"])

    a, b = PackedIndex.load(plain), PackedIndex.load(bucketed)
    assert list(a.docids) == list(b.docids)
    np.testing.assert_allclose(np.asarray(b.values, np.float32),
                               np.asarray(a.values, np.float32),
                               atol=2e-3, rtol=2e-2)
    assert (a.indices == b.indices).mean() > 0.98  # argmax near-tie slack

    # query path: qids restored to input order too
    qa, qb = str(tmp_path / "qa.npz"), str(tmp_path / "qb.npz")
    main(["encode", *common, "--encode-is-qry", "--output", qa])
    main(["encode", *common, "--encode-is-qry", "--output", qb,
          "--length-bucketing"])
    with open(qa + ".qids.json") as f:
        qids_a = json.load(f)
    with open(qb + ".qids.json") as f:
        qids_b = json.load(f)
    assert qids_a == qids_b
    va, vb = np.load(qa)["values"], np.load(qb)["values"]
    np.testing.assert_allclose(np.asarray(vb, np.float32),
                               np.asarray(va, np.float32),
                               atol=2e-3, rtol=2e-2)


def test_serve_cli_end_to_end(tmp_path, rng):
    """`python -m dhr_tpu serve` as a real subprocess: /healthz, vector
    /search, micro-batch + low-latency flags wired through the verb."""
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    from dhr_tpu.retrieval import PackedIndex

    from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher

    values = (rng.random((48, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (48, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(48)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    packed.save(str(tmp_path / "index.npz"))

    # pre-warm the persistent compile cache with the subprocess's exact
    # programs (same config -> same HLO): under full-suite CPU contention a
    # cold in-subprocess compile can exceed any sane HTTP timeout
    warm = Searcher(DeviceIndex.from_packed(packed),
                    SearchConfig(topk=5, mode="gip", theta=0.0,
                                 query_batch=4))
    warm.search_run(["w", "w2"], values[:2].astype(np.float32),
                    indices[:2].astype(np.int32))

    # hold the socket with SO_REUSEADDR so the gap before the subprocess
    # binds can't be sniped by another process picking the same ephemeral
    # port (single-tenant box: releasing just before Popen is fine)
    sock = socket.socket()
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache")
    # keep the TPU-relay sitecustomize OUT of the child: its axon client can
    # hang at import while another process holds the chip (same rule as
    # __graft_entry__.dryrun_multichip's subprocess)
    inherited = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + inherited)
    proc = subprocess.Popen(
        [sys.executable, "-m", "dhr_tpu", "serve",
         "--index-path", str(tmp_path / "index.npz"),
         "--port", str(port), "--topk", "5", "--brute-force",
         "--query-batch", "4", "--micro-batch-ms", "2",
         "--low-latency-batch", "2"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 360
        health = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    health = json.loads(r.read())
                break
            except Exception:  # noqa: BLE001 - still starting
                if proc.poll() is not None:
                    raise AssertionError("serve process died during startup")
                time.sleep(1.0)
        assert health == {"status": "ok", "rows": 48}
        payload = json.dumps({
            "values": values[:2].astype(np.float32).tolist(),
            "indices": indices[:2].astype(int).tolist(),
            "qids": ["q0", "q1"],
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=480) as r:
            out = json.loads(r.read())
        assert out["results"]["q0"][0] == "d0"
        assert out["results"]["q1"][0] == "d1"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        assert stats["low_latency_batch"] == 2
    finally:
        proc.kill()
        proc.wait(timeout=10)


def test_beir_cli_multi_dataset_suite(tmp_path, rng, monkeypatch, capsys):
    """`beir --datasets a,b`: the 13-set-style loop over local zips emits
    the per-dataset table + averages (reference's README aggregation)."""
    import zipfile

    import dhr_tpu.cli.main as climain

    VOCAB = 70

    class FakeTokenizer:
        def encode(self, text, add_special_tokens=False, max_length=None,
                   truncation=True):
            ids = [(hash(w) % (VOCAB - 2)) + 2 for w in text.split()]
            return ids[: max_length or 16] or [2]

    def write_beir(src):
        os.makedirs(os.path.join(src, "qrels"), exist_ok=True)
        with open(os.path.join(src, "corpus.jsonl"), "w") as f:
            for i in range(12):
                f.write(json.dumps({"_id": f"c{i}", "title": f"t {i}",
                                    "text": f"body text {i}"}) + "\n")
        with open(os.path.join(src, "queries.jsonl"), "w") as f:
            for i in range(3):
                f.write(json.dumps({"_id": f"q{i}",
                                    "text": f"body text {i}"}) + "\n")
        with open(os.path.join(src, "qrels", "test.tsv"), "w") as f:
            f.write("query-id\tcorpus-id\tscore\n")
            for i in range(3):
                f.write(f"q{i}\tc{i}\t1\n")

    dl = tmp_path / "dl"
    dl.mkdir()
    for name in ("seta", "setb"):
        src = tmp_path / "src" / name
        write_beir(str(src))
        with zipfile.ZipFile(dl / f"{name}.zip", "w") as z:
            for root, _, files in os.walk(src):
                for fn in files:
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, src.parent))

    monkeypatch.setattr(climain, "_load_tokenizer",
                        lambda path: FakeTokenizer())
    main(["beir", "--model", "dhr", "--tiny", "--tiny-vocab", str(VOCAB),
          "--add-pooler", "--projection-dim", "4", "--dlr-out-dim", "8",
          "--remove-dims", "6", "--cls-token-id", "1", "--sep-token-id", "0",
          "--q-max-len", "8", "--p-max-len", "12", "--batch-size", "8",
          "--datasets", "seta,setb", "--download-dir", str(dl),
          "--topk", "10", "--length-bucketing"])
    out = json.loads(capsys.readouterr().out)
    assert out["num_completed"] == 2
    assert set(out["datasets"]) == {"seta", "setb"}
    for d in out["datasets"].values():
        assert 0.0 <= d["NDCG@10"] <= 1.0
    assert out["avg_NDCG@10"] is not None
    assert out["avg_R_cap@100"] is not None


def test_info_verb_reports_environment(capsys):
    main(["info"])
    out = json.loads(capsys.readouterr().out)
    assert out["backend"] == "cpu"  # conftest forces the CPU platform
    assert out["device_count"] >= 1
    import dhr_tpu

    assert out["dhr_tpu"] == dhr_tpu.__version__  # single source of truth
    assert isinstance(out["native_runtime"], bool)
    assert out["process_count"] == 1


def test_compile_cache_default_on(tmp_path, monkeypatch, capsys):
    """main() points the persistent compile cache at the user cache dir
    unless the user set JAX_COMPILATION_CACHE_DIR or opted out."""
    import jax

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("DHR_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        # a process that configured the cache itself (like the test
        # conftest) is left alone
        main(["info"])
        assert jax.config.jax_compilation_cache_dir == prev
        jax.config.update("jax_compilation_cache_dir", None)
        main(["info"])
        expected = str(tmp_path / "dhr_tpu" / "jax_cache")
        assert jax.config.jax_compilation_cache_dir == expected
        assert os.path.isdir(expected)
        # opt-out leaves whatever was configured before untouched
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("DHR_TPU_COMPILE_CACHE", "0")
        main(["info"])
        assert jax.config.jax_compilation_cache_dir is None
        # explicit env var wins over the default location
        monkeypatch.delenv("DHR_TPU_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/elsewhere")
        main(["info"])
        assert jax.config.jax_compilation_cache_dir is None  # untouched
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    capsys.readouterr()
