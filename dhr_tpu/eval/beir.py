"""BEIR zero-shot evaluation harness.

Replaces the reference's BEIR wrapper stack (tevatron/datasets/beir/
preprocess.py + encode_and_retrieval.py + sentence_bert.py — a
SentenceTransformer-compatible shim around torch models feeding BEIR's
``DenseRetrievalExactSearch``) with a direct pipeline over dhr_tpu's own
encoder and searcher: load a local BEIR dataset directory, tokenize, encode
corpus + queries, exact (or theta-approximate) search, then NDCG@10 /
Recall@100 / R_cap@100 — the metrics the reference reports
(encode_and_retrieval.py:66-71).

Dataset layout expected (the standard BEIR unzip):
  <dir>/corpus.jsonl   {"_id", "title", "text"}
  <dir>/queries.jsonl  {"_id", "text"}
  <dir>/qrels/<split>.tsv  query-id \t corpus-id \t score  (header allowed)

The self-hit filter (drop docid == qid) is applied in the run writer as the
reference does (gip_retrieval.py:340) — it matters on BEIR corpora where
queries are drawn from the collection (e.g. arguana, quora).
"""

from __future__ import annotations

import csv
import json
import logging
import os

from dhr_tpu.data.collate import collate_encode
from dhr_tpu.eval.metrics import ndcg_at_k, recall_at_k, recall_cap_at_k

logger = logging.getLogger(__name__)

# the canonical public BEIR bucket (reference preprocess.py:22)
BEIR_URL = (
    "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets/"
    "{}.zip"
)

# the 13-dataset zero-shot suite the reference README reports averages over
BEIR_13 = (
    "trec-covid", "nfcorpus", "nq", "hotpotqa", "fiqa", "arguana",
    "webis-touche2020", "quora", "dbpedia-entity", "scidocs", "fever",
    "climate-fever", "scifact",
)


def download_beir_dataset(
    name: str, download_dir: str, url_template: str = BEIR_URL
) -> str:
    """Download + unzip one BEIR dataset; returns the extracted directory.

    Mirrors the reference's ``beir.util.download_and_unzip`` step
    (tevatron/datasets/beir/preprocess.py:11-43) without the beir package.
    Already-extracted datasets are reused without touching the network, so
    pre-seeded ``<download_dir>/<name>`` directories work offline.
    """
    out_dir = os.path.join(download_dir, name)
    if os.path.exists(os.path.join(out_dir, "corpus.jsonl")):
        logger.info("BEIR dataset %s already present at %s", name, out_dir)
        return out_dir
    os.makedirs(download_dir, exist_ok=True)
    zip_path = os.path.join(download_dir, f"{name}.zip")
    if not os.path.exists(zip_path):
        import urllib.request

        url = url_template.format(name)
        logger.info("downloading %s -> %s", url, zip_path)
        try:
            urllib.request.urlretrieve(url, zip_path + ".part")
        except OSError as e:
            raise RuntimeError(
                f"could not download BEIR dataset '{name}' from {url} "
                f"({e}); if this host has no network access, place the "
                f"zip at {zip_path} or the unzipped dataset at {out_dir}"
            ) from e
        os.replace(zip_path + ".part", zip_path)
    import zipfile

    with zipfile.ZipFile(zip_path) as z:
        z.extractall(download_dir)
    if not os.path.exists(os.path.join(out_dir, "corpus.jsonl")):
        raise RuntimeError(
            f"unzipped {zip_path} but {out_dir}/corpus.jsonl is missing — "
            "unexpected archive layout"
        )
    return out_dir


def load_beir_dir(path: str, split: str = "test"):
    """Load a BEIR dataset directory -> (corpus, queries, qrels)."""
    corpus = {}
    with open(os.path.join(path, "corpus.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            text = " ".join(
                p for p in [row.get("title", ""), row.get("text", "")] if p
            )
            corpus[str(row["_id"])] = text
    queries = {}
    with open(os.path.join(path, "queries.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            queries[str(row["_id"])] = row["text"]
    qrels: dict[str, dict[str, int]] = {}
    with open(os.path.join(path, "qrels", f"{split}.tsv"), newline="") as f:
        for parts in csv.reader(f, delimiter="\t"):
            if not parts or parts[0] in ("query-id", "qid"):
                continue
            qid, docid, rel = parts[0], parts[1], int(float(parts[2]))
            qrels.setdefault(qid, {})[docid] = rel
    queries = {q: t for q, t in queries.items() if q in qrels}
    return corpus, queries, qrels


def _tokenize_batches(items: dict[str, str], tokenizer, max_len: int,
                      batch_size: int, cls_id: int | None,
                      sep_id: int | None = None,
                      length_bucketing: bool = False):
    from dhr_tpu.data.collate import wrap_specials

    ids = list(items.keys())
    if length_bucketing:
        # BEIR corpora are short-document at p_max_len 512 — bucketed batches
        # cut pad FLOPs by the mean/max length ratio.  Output order follows
        # the length sort, which is fine here: search results and qrels are
        # keyed by id, never by row position.
        from dhr_tpu.encode import bucketed_encode_batches

        toks = [
            tokenizer.encode(items[i], add_special_tokens=False,
                             max_length=max_len, truncation=True)
            for i in ids
        ]
        batches, _ = bucketed_encode_batches(
            ids, toks, batch_size, max_len, cls_id, sep_id
        )
        yield from batches
        return
    for start in range(0, len(ids), batch_size):
        chunk = ids[start: start + batch_size]
        toks = []
        for i in chunk:
            t = tokenizer.encode(
                items[i], add_special_tokens=False,
                max_length=max_len, truncation=True,
            )
            toks.append(wrap_specials(t, max_len, cls_id, sep_id))
        yield collate_encode(chunk, toks, max_len)


def evaluate_beir(
    encoder,
    search_config,
    dataset_dir: str,
    tokenizer,
    split: str = "test",
    q_max_len: int = 512,
    p_max_len: int = 512,
    cls_id: int | None = 101,
    sep_id: int | None = None,
    mesh=None,
    k_values=(10, 100),
    length_bucketing: bool = False,
    pack: bool = False,
    pack_segments: int = 8,
) -> dict:
    """End-to-end BEIR eval for one dataset directory.

    ``encoder`` is a :class:`dhr_tpu.encode.Encoder`; ``search_config`` a
    :class:`dhr_tpu.retrieval.SearchConfig`.
    """
    from dhr_tpu.retrieval import DeviceIndex, Searcher

    corpus, queries, qrels = load_beir_dir(dataset_dir, split)
    bs = encoder.encode_cfg.batch_size
    if pack:
        # token-level packing beats bucketing when documents are much
        # shorter than p_max_len; corpus order is id-keyed downstream, so
        # the plan order never matters here
        from dhr_tpu.encode import packed_encode_batches

        doc_ids = list(corpus.keys())
        toks = [
            tokenizer.encode(corpus[i], add_special_tokens=False,
                             max_length=p_max_len, truncation=True)
            for i in doc_ids
        ]
        gen, _ = packed_encode_batches(
            doc_ids, toks, bs, p_max_len, pack_segments, cls_id, sep_id
        )
        packed = encoder.encode_corpus_packed(gen)
    else:
        packed = encoder.encode_corpus(
            _tokenize_batches(corpus, tokenizer, p_max_len, bs, cls_id,
                              sep_id, length_bucketing=length_bucketing)
        )
    qv, qi, qids = encoder.encode_queries(
        _tokenize_batches(queries, tokenizer, q_max_len, bs, cls_id, sep_id,
                          length_bucketing=length_bucketing)
    )
    searcher = Searcher(DeviceIndex.from_packed(packed, mesh=mesh),
                        search_config)
    results, scores = searcher.search_run(qids, qv, qi)
    # self-hit filter, then evaluate
    run = {
        qid: {
            d: s for d, s in zip(results[qid], scores[qid]) if d != qid
        }
        for qid in results
    }
    out = {}
    for k in k_values:
        out[f"NDCG@{k}"] = ndcg_at_k(qrels, run, k)
        out[f"Recall@{k}"] = recall_at_k(qrels, run, k)
        out[f"R_cap@{k}"] = recall_cap_at_k(qrels, run, k)
    out["num_queries"] = len(qids)
    return out
