"""Resident search service over real HTTP on a random port."""

import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np

from dhr_tpu.retrieval import DeviceIndex, PackedIndex, SearchConfig, Searcher
from dhr_tpu.serve import SearchService, make_handler


def build_service(rng):
    values = (rng.random((32, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (32, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(32)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=4),
    )
    return SearchService(searcher), packed


def test_http_service_roundtrip(rng):
    service, packed = build_service(rng)
    server = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health == {"status": "ok", "rows": 32}

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["rows"] == 32 and stats["mode"] == "gip"

        payload = json.dumps({
            "values": packed.values[:2].astype(np.float32).tolist(),
            "indices": packed.indices[:2].astype(int).tolist(),
            "qids": ["q0", "q1"],
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert set(out["results"]) == {"q0", "q1"}
        assert len(out["results"]["q0"]) == 5
        # exact self-vector query: self-match must rank first
        assert out["results"]["q0"][0] == "d0"

        # malformed request -> 400 with an error body
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        t.join(timeout=5)
