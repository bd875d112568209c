"""CLI --row-chunk: chunked ip-mode search equals the plain path at a
PRIME row count (tail-slice path), through the real search verb.

The engine-level twins live in tests/test_retrieval.py; this pins the
CLI plumbing (flag -> SearchConfig -> layout=row engine) the way the
8.8M measured point exercises it (docs/measured_points.json)."""

import json

import numpy as np

from dhr_tpu.cli.main import main
from dhr_tpu.retrieval.index import PackedIndex


def test_search_cli_row_chunk_prime_rows(tmp_path, rng):
    N, lex, cls = 97, 12, 4
    vals = (rng.random((N, lex + cls)) + 0.05).astype(np.float16)
    idxs = rng.integers(0, 5, (N, lex)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(N)], dtype=object)
    corpus = str(tmp_path / "corpus.npz")
    PackedIndex(vals, idxs, docids, lex_dim=lex).save(corpus)

    qnpz = str(tmp_path / "queries.npz")
    np.savez(qnpz, values=vals[:3].astype(np.float32),
             indices=idxs[:3].astype(np.int32))
    with open(qnpz + ".qids.json", "w") as f:
        json.dump(["q0", "q1", "q2"], f)

    plain = str(tmp_path / "plain.trec")
    main(["search", "--index-path", corpus, "--query-path", qnpz,
          "--IP", "--layout", "row", "--topk", "7", "--query-batch", "3",
          "--row-chunk", "-1", "--output", plain])
    chunked = str(tmp_path / "chunked.trec")
    main(["search", "--index-path", corpus, "--query-path", qnpz,
          "--IP", "--layout", "row", "--topk", "7", "--query-batch", "3",
          "--row-chunk", "32", "--output", chunked])
    # 97 rows / target 32 -> 3 chunks of 32 + a 1-row tail
    assert open(plain).read() == open(chunked).read()
