"""Streaming corpus densification: sparse vocab vectors -> (value, index) planes.

Replaces the reference's per-token Python loop (densify/densify_corpus.py:
29-52, the #3 hot loop in SURVEY.md section 3.5) with vectorized batch
scatter + fold-max: a batch of sparse rows is scattered into a dense
``(B, vocab - omission)`` matrix and reduced with one reshape/max/argmax —
the exact op the model-side ``dhr_tpu.ops.densify`` runs on device.

Model table parity (densify_corpus.py:17-27):

=============  ==========  ================  =============
front end      omission    whole-word terms  index dtype
=============  ==========  ================  =============
bm25           472         yes               int16
deepimpact     502         yes               int16
unicoil        570         no (wordpiece)    uint8
splade         570         no (wordpiece)    uint8
=============  ==========  ================  =============

Query index planes are always int16 (densify_query.py:73).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterable

import numpy as np

from dhr_tpu.ops.densify import REMOVE_DIMS_BY_MODEL
from dhr_tpu.retrieval.index import PackedIndex

WHOLE_WORD_MODELS = {"bm25": True, "deepimpact": True,
                     "unicoil": False, "splade": False}


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    model: str = "bm25"
    out_dim: int = 768
    vocab_size: int | None = None  # required for whole-word models

    @property
    def omission(self) -> int:
        return REMOVE_DIMS_BY_MODEL[self.model]

    @property
    def index_dtype(self):
        return np.int16 if WHOLE_WORD_MODELS[self.model] else np.uint8

    def padded_vocab(self, raw_vocab: int) -> int:
        """Smallest vocab >= raw that densifies evenly into out_dim."""
        usable = raw_vocab - self.omission
        k = -(-usable // self.out_dim)
        return self.omission + k * self.out_dim


def densify_batch(
    rows: list[dict[int, float]], cfg: DensifyConfig, vocab_size: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized densification of a batch of sparse rows.

    Uses the C++ CSR densifier when built; the NumPy scatter + fold-max path
    is the fallback and semantic reference.  Returns ``(values f16 (B, d),
    indices (B, d), n_collisions)``.
    """
    B, d, om = len(rows), cfg.out_dim, cfg.omission
    usable = vocab_size - om
    assert usable % d == 0, (vocab_size, om, d)

    try:
        from dhr_tpu import native

        native_ok = native.available()
    except Exception:  # noqa: BLE001
        native_ok = False
    if native_ok:
        # CSR with per-row ascending tids (tie parity with argmax: the
        # lowest fold wins equal maxima)
        tid_rows = []
        w_rows = []
        for vec in rows:
            if vec:
                t = np.fromiter((int(k) for k in vec), np.int64, len(vec))
                w = np.fromiter(vec.values(), np.float32, len(vec))
                order = np.argsort(t, kind="stable")
                tid_rows.append(t[order])
                w_rows.append(w[order])
            else:
                tid_rows.append(np.zeros(0, np.int64))
                w_rows.append(np.zeros(0, np.float32))
        offsets = np.zeros(B + 1, np.int64)
        np.cumsum([len(t) for t in tid_rows], out=offsets[1:])
        tids = np.concatenate(tid_rows) if tid_rows else np.zeros(0, np.int64)
        ws = np.concatenate(w_rows) if w_rows else np.zeros(0, np.float32)
        values, indices, collisions = native.densify_csr(
            tids.astype(np.int32), ws, offsets, om, d, vocab_size
        )
        return (values.astype(np.float16),
                indices.astype(cfg.index_dtype), collisions)

    dense = np.zeros((B, usable), np.float32)
    collisions = 0
    for i, vec in enumerate(rows):
        if not vec:
            continue
        tids = np.fromiter((int(t) for t in vec), np.int64, len(vec))
        ws = np.fromiter(vec.values(), np.float32, len(vec))
        keep = (tids >= om) & (tids < vocab_size)
        tids, ws = tids[keep], ws[keep]
        u = tids - om
        sl = u % d
        collisions += len(sl) - len(np.unique(sl))  # extras beyond 1st/slice
        dense[i, u] = ws
    folded = dense.reshape(B, usable // d, d)
    values = folded.max(axis=1).astype(np.float16)
    indices = folded.argmax(axis=1).astype(cfg.index_dtype)
    return values, indices, collisions


def densify_corpus(
    sparse_rows: Iterable[tuple[str, dict]],
    cfg: DensifyConfig,
    vocab_size: int,
    batch_size: int = 256,
) -> PackedIndex:
    """Densify a (docid, sparse-vector) stream into a PackedIndex."""
    vocab_size = cfg.padded_vocab(vocab_size)
    all_vals, all_idx, all_ids = [], [], []
    batch_rows, batch_ids = [], []
    total_collisions = 0

    def flush():
        nonlocal total_collisions
        if not batch_rows:
            return
        v, i, c = densify_batch(batch_rows, cfg, vocab_size)
        total_collisions += c
        all_vals.append(v)
        all_idx.append(i)
        all_ids.extend(batch_ids)
        batch_rows.clear()
        batch_ids.clear()

    for docid, vec in sparse_rows:
        batch_ids.append(str(docid))
        batch_rows.append(vec)
        if len(batch_rows) >= batch_size:
            flush()
    flush()
    values = np.concatenate(all_vals, axis=0) if all_vals else np.zeros(
        (0, cfg.out_dim), np.float16
    )
    indices = np.concatenate(all_idx, axis=0) if all_idx else np.zeros(
        (0, cfg.out_dim), cfg.index_dtype
    )
    index = PackedIndex(
        values=values,
        indices=indices,
        docids=np.asarray(all_ids, dtype=object),
        lex_dim=cfg.out_dim,
    )
    index.collisions = total_collisions  # diagnostic, like the reference's print
    return index


def densify_query_rows(
    rows: Iterable[tuple[str, dict]],
    cfg: DensifyConfig,
    vocab_size: int,
    batch_size: int = 256,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Densify query sparse vectors; index plane always int16."""
    vocab_size = cfg.padded_vocab(vocab_size)
    qcfg = dataclasses.replace(cfg)
    vals, idxs, ids = [], [], []
    batch_rows, batch_ids = [], []

    def flush():
        if not batch_rows:
            return
        v, i, _ = densify_batch(batch_rows, qcfg, vocab_size)
        vals.append(v)
        idxs.append(i.astype(np.int16))
        ids.extend(batch_ids)
        batch_rows.clear()
        batch_ids.clear()

    for qid, vec in rows:
        batch_ids.append(str(qid))
        batch_rows.append(vec)
        if len(batch_rows) >= batch_size:
            flush()
    flush()
    return (
        np.concatenate(vals, axis=0),
        np.concatenate(idxs, axis=0),
        ids,
    )
