"""Minimal reference client for the dhr_tpu serve daemon (stdlib only).

Usage:
    python tools/serve_client.py stats  [--host H] [--port P]
    python tools/serve_client.py search --values-npz queries.npz \
        [--qids-json queries.npz.qids.json]
    python tools/serve_client.py text "what is dense retrieval" [...more]

`search` posts the arrays produced by `python -m dhr_tpu encode
--encode-is-qry`; `text` needs the daemon started with `--query-encoder`.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def _post(url: str, payload: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["stats", "healthz", "search", "text"])
    ap.add_argument("queries", nargs="*", help="raw query strings for `text`")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--values-npz", default=None,
                    help="encoded query arrays (values [+ indices])")
    ap.add_argument("--qids-json", default=None)
    ap.add_argument("--timeout", type=float, default=120.0)
    args = ap.parse_args(argv)
    base = f"http://{args.host}:{args.port}"

    if args.cmd in ("stats", "healthz"):
        with urllib.request.urlopen(f"{base}/{args.cmd}",
                                    timeout=args.timeout) as r:
            out = json.loads(r.read())
    elif args.cmd == "text":
        if not args.queries:
            ap.error("text mode needs at least one query string")
        out = _post(f"{base}/search_text", {"queries": args.queries},
                    args.timeout)
    else:
        if not args.values_npz:
            ap.error("search mode needs --values-npz")
        import numpy as np

        with np.load(args.values_npz) as z:
            payload = {"values": z["values"].astype(float).tolist()}
            if "indices" in z.files:
                payload["indices"] = z["indices"].astype(int).tolist()
        if args.qids_json:
            with open(args.qids_json) as f:
                payload["qids"] = json.load(f)
        out = _post(f"{base}/search", payload, args.timeout)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
