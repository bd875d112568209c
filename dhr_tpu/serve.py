"""Resident search service: the index lives on device, queries over HTTP.

The reference serves retrieval as a batch script over pickle files
(gip_retrieval.py); for production deployment dhr_tpu keeps the sharded
index resident and answers queries from a small stdlib HTTP server:

- ``POST /search``   {"values": [[...]], "indices": [[...]] | null,
                      "qids": [...] (optional)}  ->
                     {"results": {qid: [docid...]}, "scores": {...}}
- ``GET /healthz``   {"status": "ok", "rows": N}
- ``GET /stats``     index diagnostics (retrieval/stats.py)

Single-threaded by design: the TPU executes one program at a time, so
requests queue at the server and batch through the compiled search programs.
"""

from __future__ import annotations

import json
import logging
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

logger = logging.getLogger("dhr_tpu.serve")


class SearchService:
    """Wraps a Searcher with a JSON request/response surface."""

    def __init__(self, searcher):
        self.searcher = searcher

    def search(self, payload: dict) -> dict:
        values = np.asarray(payload["values"], np.float32)
        indices = payload.get("indices")
        if indices is not None:
            indices = np.asarray(indices, np.int32)
        qids = payload.get("qids") or [str(i) for i in range(len(values))]
        results, scores = self.searcher.search_run(qids, values, indices)
        return {"results": results, "scores": scores}

    def stats(self) -> dict:
        idx = self.searcher.index
        return {
            "rows": int(idx.num_rows),
            "dim": int(idx.dim),
            "lex_dim": int(idx.lex_dim),
            "sharded_over": 1 if idx.mesh is None else int(idx.mesh.size),
            "mode": self.searcher.config.mode,
            "theta": self.searcher.config.theta,
            "topk": self.searcher.config.topk,
        }


def make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug(fmt, *args)

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "rows": service.stats()["rows"]})
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/search":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                self._reply(200, service.search(payload))
            except Exception as e:  # noqa: BLE001 - report to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(searcher, host: str = "127.0.0.1", port: int = 8080):
    """Blocking serve loop."""
    service = SearchService(searcher)
    server = HTTPServer((host, port), make_handler(service))
    logger.info("serving %d rows on %s:%d", searcher.index.num_rows, host,
                port)
    server.serve_forever()
