"""Resident search service over real HTTP on a random port."""

import json
import os
import threading
import time
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

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


def test_micro_batcher_coalesces_and_demuxes(rng):
    """Concurrent requests pool into one device batch; each caller gets only
    its own qids back, even when qids collide across requests."""
    from dhr_tpu.serve import MicroBatcher

    values = (rng.random((32, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (32, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(32)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8),
    )
    # direct (unbatched) reference answers
    want = {}
    for i in range(4):
        r, _ = searcher.search_run(
            ["q"], packed.values[i: i + 1].astype(np.float32),
            packed.indices[i: i + 1].astype(np.int32))
        want[i] = r["q"]

    batcher = MicroBatcher(searcher, window_ms=500.0)
    got = {}
    errs = []

    def one(i):
        try:
            # every request uses the SAME qid "q" — collisions must demux
            r, s = batcher.search(
                ["q"], packed.values[i: i + 1].astype(np.float32),
                packed.indices[i: i + 1].astype(np.int32))
            got[i] = r["q"]
            assert len(s["q"]) == 5
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    for i in range(4):
        assert list(got[i]) == list(want[i]), i
        assert got[i][0] == f"d{i}"  # self-match first, per request
    # with a 500 ms window the 4 requests coalesced into 1-2 batches
    assert batcher.batches_run <= 2
    assert batcher.max_batch_seen >= 2


def test_http_service_micro_batch_mode(rng):
    """Threaded server + micro-batching returns the same per-request
    results as direct mode and reports batch stats."""
    from http.server import ThreadingHTTPServer

    values = (rng.random((32, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (32, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(32)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8),
    )
    service = SearchService(searcher, micro_batch_ms=200.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        results = {}

        def ask(i):
            payload = json.dumps({
                "values": packed.values[i: i + 1].astype(np.float32).tolist(),
                "indices": packed.indices[i: i + 1].astype(int).tolist(),
                "qids": ["q"],
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                results[i] = json.loads(r.read())["results"]["q"]

        threads = [threading.Thread(target=ask, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        for i in range(3):
            assert results[i][0] == f"d{i}"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["micro_batches_run"] >= 1
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_micro_batcher_low_latency_route(rng):
    """Pools that fit the small searcher run there; results identical."""
    import dataclasses

    from dhr_tpu.serve import MicroBatcher

    values = (rng.random((32, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (32, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(32)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    idx = DeviceIndex.from_packed(packed)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8)
    big = Searcher(idx, cfg)
    small = Searcher(idx, dataclasses.replace(cfg, query_batch=2))
    batcher = MicroBatcher(big, window_ms=1.0, small_searcher=small)
    r, s = batcher.search(
        ["q"], packed.values[3:4].astype(np.float32),
        packed.indices[3:4].astype(np.int32))
    assert r["q"][0] == "d3"
    assert batcher.small_batches_run == 1
    # a full-size pool routes to the big searcher
    r8, _ = batcher.search(
        [f"q{i}" for i in range(8)], packed.values[:8].astype(np.float32),
        packed.indices[:8].astype(np.int32))
    assert all(r8[f"q{i}"][0] == f"d{i}" for i in range(8))
    assert batcher.small_batches_run == 1  # unchanged


def test_search_text_endpoint(rng):
    """/search_text: raw strings -> tokenizer -> resident encoder -> search.

    Corpus is the encoder's own output for the same strings, so the
    self-match must rank first."""
    import jax
    import jax.numpy as jnp
    from http.server import ThreadingHTTPServer

    from dhr_tpu.data.collate import collate_encode, wrap_specials
    from dhr_tpu.encode import EncodeConfig, Encoder, make_query_encoder
    from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
    from dhr_tpu.models.transformer import EncoderConfig

    VOCAB = 70

    class FakeTokenizer:
        def encode(self, text, add_special_tokens=False, max_length=None,
                   truncation=True):
            ids = [(hash(w) % (VOCAB - 2)) + 2 for w in text.split()]
            return ids[: max_length or 16] or [2]

    cfg = RetrieverConfig(
        model_type="dhr", encoder=EncoderConfig.tiny(vocab_size=VOCAB),
        add_pooler=True, projection_dim=4, dlr_out_dim=8,
    )
    model = BiEncoder(cfg)
    probe = {"input_ids": jnp.ones((2, 6), jnp.int32),
             "attention_mask": jnp.ones((2, 6), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), query=probe,
                        passage=probe)["params"]
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4,
                                                   remove_dims=6))
    tok = FakeTokenizer()
    texts = [f"doc number {i} about topic {i % 5}" for i in range(12)]
    batches = [collate_encode(
        [f"d{i}" for i in range(12)],
        [wrap_specials(tok.encode(t, max_length=8), 10, 1, 0) for t in texts],
        10,
    )]
    packed = enc.encode_corpus(iter(batches))
    searcher = Searcher(DeviceIndex.from_packed(packed),
                        SearchConfig(topk=3, mode="gip", query_batch=4))
    qenc = make_query_encoder(enc, tok, q_max_len=10, cls_id=1, sep_id=0)
    # ground truth: encode the same strings to vectors, search directly
    want_qv, want_qi = qenc([texts[3], texts[7]])
    want, _ = searcher.search_run(["a", "b"], want_qv, want_qi)
    service = SearchService(searcher, micro_batch_ms=50.0,
                            query_encoder=qenc)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        payload = json.dumps({"queries": [texts[3], texts[7]],
                              "qids": ["a", "b"]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search_text", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["results"]["a"] == list(want["a"])
        assert out["results"]["b"] == list(want["b"])
        # text search without an encoder -> 400
        plain = SearchService(searcher)
        try:
            plain.search_text({"queries": ["x"]})
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_micro_batcher_rejects_malformed_without_poisoning_pool(rng):
    """A bad request fails alone at submit; the pool and worker survive."""
    from dhr_tpu.serve import MicroBatcher

    values = (rng.random((16, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (16, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(16)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=3, mode="gip", theta=0.0, query_batch=4),
    )
    batcher = MicroBatcher(searcher, window_ms=1.0)
    import pytest as _pytest

    # qid/row mismatch rejected at submit time (would silently misalign
    # later requests in a pool otherwise)
    with _pytest.raises(ValueError, match="need one"):
        batcher.search(["a"], packed.values[:2].astype(np.float32),
                       packed.indices[:2].astype(np.int32))
    # indices/values row mismatch
    with _pytest.raises(ValueError, match="indices rows"):
        batcher.search(["a", "b"], packed.values[:2].astype(np.float32),
                       packed.indices[:1].astype(np.int32))
    # worker is still alive and serves good requests
    r, _ = batcher.search(["q"], packed.values[:1].astype(np.float32),
                          packed.indices[:1].astype(np.int32))
    assert r["q"][0] == "d0"

    # mismatched query widths in one pool: per-request fallback, both OK
    import threading as _threading

    wide = np.pad(packed.values[:1].astype(np.float32), ((0, 0), (0, 0)))
    outs = {}

    def go(tag, qv, qi):
        try:
            rr, _ = batcher.search([tag], qv, qi)
            outs[tag] = rr[tag]
        except Exception as e:  # noqa: BLE001
            outs[tag] = e

    t1 = _threading.Thread(target=go, args=(
        "x", packed.values[:1].astype(np.float32),
        packed.indices[:1].astype(np.int32)))
    t2 = _threading.Thread(target=go, args=("y", wide, None))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert list(outs["x"])[0] == "d0"  # lexical request fine
    # dense request against a lexical searcher may succeed (ip-less gip
    # treats missing indices as all-match) or raise — but it must NOT
    # poison request x, and the worker must survive:
    r, _ = batcher.search(["z"], packed.values[1:2].astype(np.float32),
                          packed.indices[1:2].astype(np.int32))
    assert r["z"][0] == "d1"


def test_make_query_encoder_chunks_oversize_requests(rng):
    """More queries than the encode batch never changes the compiled shape."""
    import jax
    import jax.numpy as jnp

    from dhr_tpu.encode import EncodeConfig, Encoder, make_query_encoder
    from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
    from dhr_tpu.models.transformer import EncoderConfig

    class FakeTokenizer:
        def encode(self, text, add_special_tokens=False, max_length=None,
                   truncation=True):
            return [(hash(w) % 60) + 2 for w in text.split()][:max_length] \
                or [2]

    cfg = RetrieverConfig(
        model_type="dhr", encoder=EncoderConfig.tiny(vocab_size=70),
        add_pooler=True, projection_dim=4, dlr_out_dim=8,
    )
    model = BiEncoder(cfg)
    probe = {"input_ids": jnp.ones((2, 6), jnp.int32),
             "attention_mask": jnp.ones((2, 6), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), query=probe,
                        passage=probe)["params"]
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4,
                                                   remove_dims=6))
    qenc = make_query_encoder(enc, FakeTokenizer(), q_max_len=8,
                              cls_id=1, sep_id=0)
    texts = [f"query number {i}" for i in range(11)]  # 11 > bs=4
    values, indices = qenc(texts)
    assert values.shape[0] == 11 and indices.shape[0] == 11
    # chunked result == one-text-at-a-time results
    v1, _ = qenc([texts[6]])
    np.testing.assert_allclose(values[6], v1[0], atol=1e-5)


def test_micro_batcher_concurrent_stress_matches_direct(rng):
    """20 concurrent random-size requests through the batcher: every
    response equals the direct (unbatched) answer for the same vectors."""
    from concurrent.futures import ThreadPoolExecutor

    from dhr_tpu.serve import MicroBatcher

    values = (rng.random((64, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (64, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(64)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=4, mode="gip", theta=0.0, query_batch=8),
    )
    reqs = []
    for i in range(20):
        n = int(rng.integers(1, 5))
        rows = rng.integers(0, 64, n)
        reqs.append((
            [f"r{i}:{j}" for j in range(n)],
            packed.values[rows].astype(np.float32),
            packed.indices[rows].astype(np.int32),
            rows,
        ))
    want = {}
    for qids, qv, qi, rows in reqs:
        r, s = searcher.search_run(qids, qv, qi)
        want[qids[0]] = {q: list(r[q]) for q in qids}

    batcher = MicroBatcher(searcher, window_ms=10.0)

    def one(req):
        qids, qv, qi, rows = req
        r, s = batcher.search(qids, qv, qi)
        assert set(r) == set(qids)
        for q in qids:
            assert len(s[q]) == 4
        return qids[0], {q: list(r[q]) for q in qids}

    with ThreadPoolExecutor(max_workers=8) as ex:
        got = dict(ex.map(one, reqs))
    assert got == want
    assert batcher.batches_run >= 1


def test_serve_client_tool(rng):
    """tools/serve_client.py drives a live service: stats, search, text."""
    import io
    import importlib.util
    import contextlib
    from http.server import ThreadingHTTPServer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serve_client", os.path.join(repo, "tools", "serve_client.py"))
    client = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(client)

    values = (rng.random((16, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (16, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(16)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=3, mode="gip", theta=0.0, query_batch=4),
    )
    service = SearchService(searcher)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            client.main(["stats", "--port", str(port)])
        assert json.loads(buf.getvalue())["rows"] == 16

        import tempfile

        d = tempfile.mkdtemp()
        np.savez(os.path.join(d, "q.npz"),
                 values=values[:2].astype(np.float32),
                 indices=indices[:2].astype(np.int32))
        with open(os.path.join(d, "qids.json"), "w") as f:
            json.dump(["a", "b"], f)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            client.main(["search", "--port", str(port),
                         "--values-npz", os.path.join(d, "q.npz"),
                         "--qids-json", os.path.join(d, "qids.json")])
        out = json.loads(buf.getvalue())
        assert out["results"]["a"][0] == "d0"
        assert out["results"]["b"][0] == "d1"
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_validate_rejects_duplicate_qids(rng):
    """A request repeating a qid fails at submit time instead of silently
    returning fewer result rows (dict keying would overwrite)."""
    import pytest

    service, packed = build_service(rng)
    with pytest.raises(ValueError, match="duplicate qids"):
        service.search({
            "values": packed.values[:2].astype(np.float32).tolist(),
            "indices": packed.indices[:2].astype(int).tolist(),
            "qids": ["q", "q"],
        })


def test_micro_batcher_overflow_request_carries_to_next_pool(rng):
    """A request that would overflow the pool past query_batch leads the
    NEXT pool instead of forcing a second padded dispatch in this one."""
    from dhr_tpu.serve import MicroBatcher

    values = (rng.random((32, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (32, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(32)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    searcher = Searcher(
        DeviceIndex.from_packed(packed),
        SearchConfig(topk=3, mode="gip", theta=0.0, query_batch=4),
    )
    batcher = MicroBatcher(searcher, window_ms=500.0)
    results = {}

    def one(name, rows):
        r, _ = batcher.search(
            [f"{name}{j}" for j in range(len(rows))],
            packed.values[rows].astype(np.float32),
            packed.indices[rows].astype(np.int32))
        results[name] = r

    # 3 + 3 queries with cap 4: the second request must NOT join the first
    # pool (3+3 > 4); it leads the next one
    ta = threading.Thread(target=one, args=("a", [0, 1, 2]))
    ta.start()
    import time as _time

    _time.sleep(0.1)  # ensure "a" is pulled first
    tb = threading.Thread(target=one, args=("b", [3, 4, 5]))
    tb.start()
    ta.join(timeout=60)
    tb.join(timeout=60)
    assert batcher.batches_run == 2
    assert batcher.max_batch_seen <= 4  # no pool ever exceeded the cap
    for j in range(3):
        assert results["a"][f"a{j}"][0] == f"d{j}"
        assert results["b"][f"b{j}"][0] == f"d{j + 3}"


def test_bounded_ingress_queue_sheds_with_503(rng):
    """Flooding a max_pending-bounded service: memory stays bounded, shed
    requests get HTTP 503 + Retry-After, accepted ones still succeed."""
    import time as _time
    import urllib.error
    from http.server import ThreadingHTTPServer
    from types import SimpleNamespace

    class SlowSearcher:
        """Stub searcher: .config + a search_run that holds the device."""

        config = SimpleNamespace(query_batch=1, mode="gip", theta=0.0,
                                 topk=1)
        index = SimpleNamespace(num_rows=1, dim=12, lex_dim=12, mesh=None)

        def search_run(self, qids, values, indices):
            _time.sleep(0.15)
            return ({q: ["d0"] for q in qids}, {q: [1.0] for q in qids})

    service = SearchService(SlowSearcher(), micro_batch_ms=1.0,
                            max_pending=1)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    codes = []
    lock = threading.Lock()

    def one():
        payload = json.dumps({"values": [[0.0] * 12], "qids": ["q"]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=payload,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                out = json.loads(r.read())
                assert out["results"]["q"] == ["d0"]
                with lock:
                    codes.append(200)
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers.get("Retry-After") == "1"
            with lock:
                codes.append(503)

    try:
        threads = [threading.Thread(target=one) for _ in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert len(codes) == 8
        assert codes.count(200) >= 1
        assert codes.count(503) >= 1  # the flood was shed, not buffered
        stats = service.stats()
        assert stats["rejects"] == codes.count(503)
        assert stats["max_pending"] == 1
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_stats_sums_escalations_across_routes(rng):
    """/stats escalated_queries must include the low-latency small
    searcher's escalations (single-query traffic is served entirely by
    it), not just the main searcher's."""
    import dataclasses

    values = (rng.random((64, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (64, 12)).astype(np.uint8)
    docids = np.asarray([f"d{i}" for i in range(64)], dtype=object)
    packed = PackedIndex(values, indices, docids, lex_dim=12)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.05, rerank=True,
                       agip_topk=40, query_batch=8,
                       approx_candidates=False,
                       escalate_pool=10, escalate_margin=1e30)
    searcher = Searcher(DeviceIndex.from_packed(packed), cfg)
    small = Searcher(searcher.index,
                     dataclasses.replace(cfg, query_batch=2))
    service = SearchService(searcher, micro_batch_ms=20.0,
                            small_searcher=small)  # daemon worker thread
    qv = (rng.random((1, 12)) + 0.1).astype(np.float32)
    qi = rng.integers(0, 3, (1, 12)).astype(np.int32)
    # single-query request -> routed to the small searcher
    out = service.search(
        {"qids": ["q0"], "values": qv.tolist(), "indices": qi.tolist()})
    assert out["results"]["q0"]
    stats = service.stats()
    assert stats["escalate_pool"] == 10
    assert stats["escalated_queries"] == small.escalated_queries == 1
    assert searcher.escalated_queries == 0


def _packed(rng, n, tag):
    values = (rng.random((n, 12)) + 0.1).astype(np.float16)
    indices = rng.integers(0, 3, (n, 12)).astype(np.uint8)
    docids = np.asarray([f"{tag}{i}" for i in range(n)], dtype=object)
    return PackedIndex(values, indices, docids, lex_dim=12)


def test_admin_reload_swaps_index_without_restart(rng, tmp_path):
    """POST /admin/reload: rankings come from the NEW corpus afterwards,
    /stats reflects the new row count, and search configs carry over."""
    old = _packed(rng, 32, "old")
    new = _packed(rng, 48, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)

    searcher = Searcher(
        DeviceIndex.from_packed(old),
        SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=4),
    )
    service = SearchService(
        searcher,
        index_loader=lambda p: DeviceIndex.from_packed(PackedIndex.load(p)),
    )
    r, _ = service._run(["q0"], old.values[:1].astype(np.float32),
                        old.indices[:1].astype(np.int32))
    assert r["q0"][0] == "old0"

    out = service.reload({"index_path": new_path})
    assert out == {"status": "ok", "rows": 48, "index_path": new_path,
                   "reloads": 1, "free_first": False}
    assert service.stats()["rows"] == 48
    assert service.stats()["reloads"] == 1
    r, _ = service._run(["q0"], new.values[:1].astype(np.float32),
                        new.indices[:1].astype(np.int32))
    assert r["q0"][0] == "new0"
    assert all(d.startswith("new") for d in r["q0"])


def test_admin_reload_micro_batch_and_low_latency_routes(rng, tmp_path):
    """With the coalescing worker + small-batch route, a reload must swap
    BOTH searchers between pools (requests never mix indexes)."""
    old = _packed(rng, 32, "old")
    new = _packed(rng, 32, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)

    idx = DeviceIndex.from_packed(old)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8)
    import dataclasses
    service = SearchService(
        Searcher(idx, cfg), micro_batch_ms=5.0,
        small_searcher=Searcher(idx, dataclasses.replace(cfg, query_batch=2)),
        index_loader=lambda p: DeviceIndex.from_packed(PackedIndex.load(p)),
    )
    qv = old.values[:1].astype(np.float32)
    qi = old.indices[:1].astype(np.int32)
    r, _ = service._run(["q0"], qv, qi)
    assert r["q0"][0] == "old0"

    service.reload({"index_path": new_path})
    # single query -> low-latency route; must already see the new index
    r, _ = service._run(["q0"], new.values[:1].astype(np.float32),
                        new.indices[:1].astype(np.int32))
    assert r["q0"][0] == "new0"
    assert service.batcher.small.config.query_batch == 2  # route survived
    # multi-query -> full route on the new index too
    r, _ = service._run(
        ["a", "b", "c"], new.values[1:4].astype(np.float32),
        new.indices[1:4].astype(np.int32))
    assert r["a"][0] == "new1"


def test_admin_reload_disabled_is_an_error(rng):
    service, packed = build_service(rng)
    with pytest.raises(ValueError, match="--allow-reload"):
        service.reload({"index_path": "/nonexistent.npz"})
    # and over HTTP it maps to a 400 with the reason in the body
    server = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index_path": "x"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "allow-reload" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_admin_reload_under_concurrent_load_never_mixes_indexes(rng, tmp_path):
    """Fire a reload while request threads hammer the coalescing worker:
    every individual response must rank docids wholly from ONE index
    (the swap applies between pools, never mid-pool), and requests after
    the reload returns must all be on the new index."""
    old = _packed(rng, 32, "old")
    new = _packed(rng, 32, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)

    idx = DeviceIndex.from_packed(old)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8)
    service = SearchService(
        Searcher(idx, cfg), micro_batch_ms=2.0,
        index_loader=lambda p: DeviceIndex.from_packed(PackedIndex.load(p)),
    )
    qv = old.values[:1].astype(np.float32)
    qi = old.indices[:1].astype(np.int32)
    service._run(["warm"], qv, qi)  # compile before the stress window

    stop = threading.Event()
    bad, responses = [], []

    def client(tag):
        k = 0
        while not stop.is_set():
            r, _ = service._run([f"{tag}:{k}"], qv, qi)
            tags = {d[:3] for d in r[f"{tag}:{k}"]}
            responses.append(tags)
            if len(tags) != 1:
                bad.append(tags)
            k += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    service.reload({"index_path": new_path})
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not bad, f"responses mixed indexes: {bad[:3]}"
    # after the in-flight pools drain, the cutover must be complete: a
    # fresh request runs wholly on the new index (the swap guarantee is
    # between-pools — a request racing INTO an old pool may still be
    # served old, which is why the drain comes first)
    r, _ = service._run(["post"], qv, qi)
    assert all(d.startswith("new") for d in r["post"])
    assert {"new"} in responses or all(
        tags == {"old"} for tags in responses
    )  # clients observed a clean cutover (or finished before it)


def test_admin_reload_free_first_frees_before_loading(rng, tmp_path):
    """free_first: the worker parks between pools and every old-searcher
    reference drops BEFORE the new index loads (full-chip indexes have no
    HBM headroom for load-then-swap).  Requests arriving during the gap
    queue and are served on the new index; the loader must observe the
    old index already released."""
    import gc
    import weakref

    old = _packed(rng, 32, "old")
    new = _packed(rng, 32, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)

    idx = DeviceIndex.from_packed(old)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8)
    old_ref = weakref.ref(idx)
    released_during_load = []

    def loader(p):
        gc.collect()
        released_during_load.append(old_ref() is None)
        return DeviceIndex.from_packed(PackedIndex.load(p))

    service = SearchService(Searcher(idx, cfg), micro_batch_ms=2.0,
                            index_loader=loader)
    del idx
    qv = old.values[:1].astype(np.float32)
    qi = old.indices[:1].astype(np.int32)
    r, _ = service._run(["q0"], qv, qi)
    assert r["q0"][0] == "old0"

    # a request fired DURING the parked window must queue and land on the
    # new index: the loader blocks until the client has enqueued, so the
    # request genuinely arrives while the worker is parked
    during: dict = {}
    in_loader = threading.Event()
    client_fired = threading.Event()

    def gated_loader(p):
        gc.collect()
        released_during_load.append(old_ref() is None)
        in_loader.set()
        assert client_fired.wait(timeout=30)
        time.sleep(0.2)  # let the client's put_nowait land in the queue
        return DeviceIndex.from_packed(PackedIndex.load(p))

    service.index_loader = gated_loader

    def late_client():
        assert in_loader.wait(timeout=30)
        client_fired.set()
        rr, _ = service._run(["late"], new.values[:1].astype(np.float32),
                             new.indices[:1].astype(np.int32))
        during["top1"] = rr["late"][0]

    t = threading.Thread(target=late_client)
    t.start()
    out = service.reload({"index_path": new_path, "free_first": True})
    t.join(timeout=60)
    assert out["free_first"] is True and out["rows"] == 32
    assert released_during_load == [True], (
        "old index must be freed before the new one loads"
    )
    assert during["top1"] == "new0"
    r, _ = service._run(["q1"], new.values[1:2].astype(np.float32),
                        new.indices[1:2].astype(np.int32))
    assert r["q1"][0] == "new1"



def test_admin_reload_free_first_failure_drains_and_recovers(rng, tmp_path):
    """A failing free-first load must NOT brick the service: queued and
    later requests fail fast with a clear error (never hang), and a
    corrective reload restores service even though the old index (and
    its config source) are long gone."""
    old = _packed(rng, 32, "old")
    new = _packed(rng, 32, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)

    idx = DeviceIndex.from_packed(old)
    cfg = SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=8)
    service = SearchService(
        Searcher(idx, cfg), micro_batch_ms=2.0,
        index_loader=lambda p: DeviceIndex.from_packed(PackedIndex.load(p)),
    )
    qv = old.values[:1].astype(np.float32)
    qi = old.indices[:1].astype(np.int32)
    service._run(["warm"], qv, qi)

    with pytest.raises(FileNotFoundError):
        service.reload({"index_path": str(tmp_path / "missing.npz"),
                        "free_first": True})
    # drain mode: requests error fast instead of hanging
    with pytest.raises(ValueError, match="no index loaded"):
        service._run(["q"], qv, qi)
    assert service.stats() == {"reloading": True, "reloads": 0}
    # corrective reload works without any live searcher to copy configs
    out = service.reload({"index_path": new_path, "free_first": True})
    assert out["rows"] == 32
    r, _ = service._run(["q0"], new.values[:1].astype(np.float32),
                        new.indices[:1].astype(np.int32))
    assert r["q0"][0] == "new0"
    assert service.batcher.small is None  # no small route configured


def test_admin_reload_token_required(rng, tmp_path):
    """With reload_token set, /admin/reload rejects missing/wrong tokens
    with 403 and accepts the right header."""
    old = _packed(rng, 16, "old")
    new = _packed(rng, 16, "new")
    new_path = str(tmp_path / "new_index.npz")
    new.save(new_path)
    service = SearchService(
        Searcher(DeviceIndex.from_packed(old),
                 SearchConfig(topk=5, mode="gip", theta=0.0, query_batch=4)),
        index_loader=lambda p: DeviceIndex.from_packed(PackedIndex.load(p)),
        reload_token="s3cret",
    )
    server = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"index_path": new_path}).encode()
        for headers, want in (
            ({}, 403),
            ({"X-Reload-Token": "wrong"}, 403),
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/admin/reload", data=body,
                headers={"Content-Type": "application/json", **headers})
            try:
                urllib.request.urlopen(req, timeout=30)
                raise AssertionError(f"expected HTTP {want}")
            except urllib.error.HTTPError as e:
                assert e.code == want
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=body,
            headers={"Content-Type": "application/json",
                     "X-Reload-Token": "s3cret"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["rows"] == 16
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_listen_backlog_covers_client_bursts():
    """The HTTP servers must override socketserver's default listen
    backlog of 5: at the 1M serve probe, 64 simultaneous fresh
    connections on a busy 1-core host overflowed the accept queue and
    the kernel dropped 5/512 requests (synack-retry exhaustion) before
    the handler ever saw them."""
    from dhr_tpu.serve import _PlainServer, _ThreadingServer, serve_service
    import inspect

    assert _PlainServer.request_queue_size >= 256
    assert _ThreadingServer.request_queue_size >= 256
    src = inspect.getsource(serve_service)
    assert "_ThreadingServer" in src and "_PlainServer" in src
