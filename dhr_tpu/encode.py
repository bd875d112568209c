"""Corpus/query encoding: jitted forward + in-graph densify/aggregate + pack.

Replaces the reference's single-GPU encode driver (driver/encode.py:27-204)
with one compiled program per role that runs the transformer forward, the
head-specific reduction (densify for DHR/DLR, aggregate+merge for AGG), and
the dtype packing **on device**, streaming back only the packed planes:

- dense:   values (B, D) f16
- agg:     values (B, agg_dim + cls_dim) f16
- dhr/dlr: values (B, dlr_out_dim [+ cls_dim]) f16  ‖  indices (B, dlr) u8

Logical output format matches the reference's embedding shards
(encode.py:155-195) so parity can be checked array-for-array; the container
is :class:`dhr_tpu.retrieval.index.PackedIndex`.

Batches are padded to a fixed shape (and to the mesh row multiple) so any
corpus size reuses one compiled program — the reference pads only its last
pmap batch (driver/jax_encode.py:68-78); here every batch is uniform.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterable

import numpy as np

import jax
import jax.numpy as jnp

from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.ops import aggregate, densify, merge_reps
from dhr_tpu.parallel import row_sharded
from dhr_tpu.retrieval.index import PackedIndex


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    batch_size: int = 32
    remove_dims: int = 570


class Encoder:
    """Batched corpus/query encoder for one (model, params) pair."""

    def __init__(
        self,
        model: BiEncoder,
        params,
        cfg: RetrieverConfig,
        encode_cfg: EncodeConfig = EncodeConfig(),
        mesh=None,
    ):
        self.model = model
        self.cfg = cfg
        self.encode_cfg = encode_cfg
        self.mesh = mesh
        if mesh is not None:
            params = jax.device_put(
                params, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            )
        self.params = params
        self._encode_query = self._build(role="query")
        self._encode_passage = self._build(role="passage")
        self._encode_packed = None  # built lazily on first packed call
        self._encode_packed_tokens = None  # colbert packed twin

    def _build(self, role: str):
        cfg = self.cfg
        ecfg = self.encode_cfg
        is_query = role == "query"

        def run(params, input_ids, attention_mask):
            batch = {"input_ids": input_ids, "attention_mask": attention_mask}
            q_reps, p_reps = self.model.apply(
                {"params": params},
                query=batch if is_query else None,
                passage=None if is_query else batch,
                deterministic=True,
            )
            reps = q_reps if is_query else p_reps
            if cfg.model_type == "dense":
                return reps.dense.astype(jnp.float16), None
            if cfg.model_type == "agg":
                tok = aggregate(
                    reps.lexical, cfg.agg_dim, full=not cfg.semi_aggregate
                )
                if reps.semantic is not None:
                    tok = merge_reps(tok, reps.semantic)
                return tok.astype(jnp.float16), None
            if cfg.model_type in ("dhr", "dlr"):
                vals, idxs = densify(
                    reps.lexical, cfg.dlr_out_dim, ecfg.remove_dims
                )
                if reps.semantic is not None and cfg.combine_cls:
                    vals = jnp.concatenate(
                        [vals, reps.semantic.astype(vals.dtype)], axis=-1
                    )
                return vals.astype(jnp.float16), idxs.astype(jnp.uint8)
            if cfg.model_type == "colbert":
                # full padded token reps, [CLS] at position 0 and masked rows
                # zeroed — the offline layout of the reference's
                # ColBERTForInference encode_query/passage splits
                # (ColBERT/modeling.py:221-252); queries are already
                # length-normalized x32 in the head
                tok = jnp.concatenate([reps.token_cls, reps.token], axis=1)
                return tok.astype(jnp.float16), None
            raise ValueError(
                f"encode does not support model_type={cfg.model_type}"
            )

        jitted = jax.jit(run)

        if self.mesh is not None and self.mesh.size > 1:
            # data-parallel encode over the mesh: batch rows sharded, params
            # replicated (the reference's encode driver is explicitly
            # single-GPU, driver/encode.py:37-38)
            from dhr_tpu.parallel import row_sharded

            sharding = row_sharded(self.mesh)

            def encode(input_ids, attention_mask):
                return jitted(
                    self.params,
                    jax.device_put(input_ids, sharding),
                    jax.device_put(attention_mask, sharding),
                )
        else:
            def encode(input_ids, attention_mask):
                return jitted(self.params, input_ids, attention_mask)

        return encode

    def _build_packed(self):
        """Jitted program for token-packed rows (multiple docs per row)."""
        cfg = self.cfg
        ecfg = self.encode_cfg
        if cfg.model_type not in ("dense", "dhr", "dlr", "agg"):
            raise ValueError(
                "packed plane encode supports dense/dhr/dlr/agg, not "
                f"{cfg.model_type}"
                + (" — colbert packs via encode_tokens_packed()"
                   if cfg.model_type == "colbert" else "")
            )

        def run(params, input_ids, segment_ids, position_ids, seg_start):
            vals, idxs, semantic = self.model.apply(
                {"params": params},
                input_ids, segment_ids, position_ids, seg_start,
                cfg.dlr_out_dim, ecfg.remove_dims,
                method="encode_passages_packed",
            )
            B, S = seg_start.shape
            if cfg.model_type == "dense":
                return vals.reshape(B * S, -1).astype(jnp.float16), None
            if cfg.model_type == "agg":
                if semantic is not None:
                    vals = merge_reps(vals, semantic)
                return vals.reshape(B * S, -1).astype(jnp.float16), None
            if semantic is not None and cfg.combine_cls:
                vals = jnp.concatenate(
                    [vals, semantic.astype(vals.dtype)], axis=-1
                )
            return (
                vals.reshape(B * S, -1).astype(jnp.float16),
                idxs.reshape(B * S, -1).astype(jnp.uint8),
            )

        jitted = jax.jit(run)

        if self.mesh is not None and self.mesh.size > 1:
            sharding = row_sharded(self.mesh)

            def encode(input_ids, segment_ids, position_ids, seg_start):
                return jitted(
                    self.params,
                    jax.device_put(input_ids, sharding),
                    jax.device_put(segment_ids, sharding),
                    jax.device_put(position_ids, sharding),
                    jax.device_put(seg_start, sharding),
                )
        else:
            def encode(input_ids, segment_ids, position_ids, seg_start):
                return jitted(self.params, input_ids, segment_ids,
                              position_ids, seg_start)

        return encode

    def _build_packed_tokens(self):
        """Jitted program for colbert token-packed rows (docs share rows)."""
        if self.cfg.model_type != "colbert":
            raise ValueError(
                "packed token encode is colbert-only, not "
                f"{self.cfg.model_type}"
            )

        def run(params, input_ids, segment_ids, position_ids):
            reps = self.model.apply(
                {"params": params}, input_ids, segment_ids, position_ids,
                method="encode_tokens_packed",
            )
            return reps.astype(jnp.float16)

        jitted = jax.jit(run)

        if self.mesh is not None and self.mesh.size > 1:
            from dhr_tpu.parallel import row_sharded

            sharding = row_sharded(self.mesh)

            def encode(input_ids, segment_ids, position_ids):
                return jitted(
                    self.params,
                    jax.device_put(input_ids, sharding),
                    jax.device_put(segment_ids, sharding),
                    jax.device_put(position_ids, sharding),
                )
        else:
            def encode(input_ids, segment_ids, position_ids):
                return jitted(self.params, input_ids, segment_ids,
                              position_ids)

        return encode

    def encode_tokens_packed(
        self, batches: Iterable[dict], out_len: int
    ) -> tuple[np.ndarray, list]:
        """ColBERT reps from token-packed batches: ``(reps (N, L, D), ids)``.

        The packed twin of :meth:`encode_tokens` (passage side).  The device
        emits one ``(B, row_len, D)`` f16 plane per batch — FEWER bytes than
        the plain path's per-document padding, on top of the transformer
        saving — and the host unpacks each document with one contiguous
        slice (its segment is laid out ``[CLS], t1, ...``), zero-padding to
        ``out_len`` so the result is drop-in for
        :mod:`dhr_tpu.retrieval.colbert` scoring.
        """
        if self._encode_packed_tokens is None:
            self._encode_packed_tokens = self._build_packed_tokens()
        reps_out, ids_out = [], []
        pending = None  # double buffer (see _run_batches)

        def _drain(pending):
            slot_ids, seg_start, segment_ids, reps_dev = pending
            reps = np.asarray(reps_dev)
            n_docs = sum(len(s) for s in slot_ids)
            out = np.zeros((n_docs, out_len, reps.shape[-1]), np.float16)
            d = 0
            for r, sids in enumerate(slot_ids):
                seg_len = np.bincount(
                    segment_ids[r], minlength=len(sids) + 1
                )
                for s, sid in enumerate(sids):
                    start = int(seg_start[r, s])
                    ln = min(int(seg_len[s + 1]), out_len)
                    out[d, :ln] = reps[r, start:start + ln]
                    ids_out.append(sid)
                    d += 1
            reps_out.append(out)

        for batch in batches:
            reps_dev = self._encode_packed_tokens(
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["segment_ids"]),
                jnp.asarray(batch["position_ids"]),
            )
            if pending is not None:
                _drain(pending)
            pending = (batch["slot_ids"], np.asarray(batch["seg_start"]),
                       np.asarray(batch["segment_ids"]), reps_dev)
        if pending is not None:
            _drain(pending)
        return np.concatenate(reps_out, axis=0), ids_out

    def encode_corpus_packed(self, batches: Iterable[dict]) -> PackedIndex:
        """Encode token-packed batches from :func:`packed_encode_batches`.

        Each batch dict carries ``input_ids / segment_ids / position_ids /
        seg_start`` arrays plus ``slot_ids`` (per-row document-id lists);
        invalid (empty) slots are dropped here, so the returned index holds
        exactly one row per document in plan order.
        """
        if self._encode_packed is None:
            self._encode_packed = self._build_packed()
        values_out, indices_out, ids_out = [], [], []
        pending = None  # double buffer (see _run_batches)

        def _drain(pending):
            valid, vals, idxs = pending
            values_out.append(np.asarray(vals)[valid])
            if idxs is not None:
                indices_out.append(np.asarray(idxs)[valid])

        for batch in batches:
            slot_ids = batch["slot_ids"]
            seg_start = np.asarray(batch["seg_start"])
            vals, idxs = self._encode_packed(
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["segment_ids"]),
                jnp.asarray(batch["position_ids"]),
                jnp.asarray(seg_start),
            )
            valid = np.zeros(seg_start.shape, bool)
            for r, sids in enumerate(slot_ids):
                valid[r, : len(sids)] = True
                ids_out.extend(sids)
            if pending is not None:
                _drain(pending)
            pending = (valid.reshape(-1), vals, idxs)
        if pending is not None:
            _drain(pending)
        values = np.concatenate(values_out, axis=0)
        indices = np.concatenate(indices_out, axis=0) if indices_out else None
        lex = self.lex_dim if self.lex_dim > 0 else values.shape[1]
        return PackedIndex(
            values=values,
            indices=indices,
            docids=np.asarray([str(i) for i in ids_out], dtype=object),
            lex_dim=lex,
        )

    @property
    def lex_dim(self) -> int:
        cfg = self.cfg
        if cfg.model_type in ("dhr", "dlr"):
            return cfg.dlr_out_dim
        if cfg.model_type == "agg":
            return cfg.agg_dim
        return -1  # dense: whole vector is "lexical" for index purposes

    def _run_batches(self, encode_fn, batches) -> tuple[np.ndarray, np.ndarray | None, list]:
        bs = self.encode_cfg.batch_size
        values_out, indices_out, ids_out = [], [], []
        pending = None  # (n, device outputs) — double buffer: the host

        # fetch of batch N overlaps the device's compute of N+1 (dispatch is
        # async; a fetch issued before the next dispatch would serialize the
        # ~31 ms relay round-trip + transfer into every batch)
        def _drain(pending):
            n, vals, idxs = pending
            values_out.append(np.asarray(vals)[:n])
            if idxs is not None:
                indices_out.append(np.asarray(idxs)[:n])

        for batch in batches:
            ids = list(batch["ids"])
            n = len(ids)
            input_ids = np.asarray(batch["input_ids"])
            mask = np.asarray(batch["attention_mask"])
            pad = bs - n
            if pad > 0:
                input_ids = np.pad(input_ids, [(0, pad), (0, 0)])
                mask = np.pad(mask, [(0, pad), (0, 0)])
            vals, idxs = encode_fn(jnp.asarray(input_ids), jnp.asarray(mask))
            if pending is not None:
                _drain(pending)
            pending = (n, vals, idxs)
            ids_out.extend(ids)
        if pending is not None:
            _drain(pending)
        values = np.concatenate(values_out, axis=0)
        indices = np.concatenate(indices_out, axis=0) if indices_out else None
        return values, indices, ids_out

    def encode_corpus(self, batches: Iterable[dict]) -> PackedIndex:
        """Encode an iterable of ``{ids, input_ids, attention_mask}`` batches."""
        if self.cfg.model_type == "colbert":
            raise ValueError(
                "colbert emits (N, L, D) token reps, not packed planes; use "
                "encode_tokens()"
            )
        values, indices, ids = self._run_batches(self._encode_passage, batches)
        lex = self.lex_dim if self.lex_dim > 0 else values.shape[1]
        return PackedIndex(
            values=values,
            indices=indices,
            docids=np.asarray([str(i) for i in ids], dtype=object),
            lex_dim=lex,
        )

    def encode_queries(self, batches: Iterable[dict]):
        """Returns ``(values, indices_or_None, qids)`` (reference query pickle)."""
        if self.cfg.model_type == "colbert":
            raise ValueError(
                "colbert emits (N, L, D) token reps, not packed planes; use "
                "encode_tokens()"
            )
        return self._run_batches(self._encode_query, batches)

    def encode_tokens(self, batches: Iterable[dict], role: str):
        """ColBERT late-interaction reps: ``(reps (N, L, D) f16, ids)``.

        The reference's ColBERTForInference only encodes in-process for the
        TCT teacher; this is the offline path it lacks — token reps padded to
        the role's max length with masked rows zeroed, scoreable standalone
        via :mod:`dhr_tpu.retrieval.colbert`.
        """
        fn = self._encode_query if role == "query" else self._encode_passage
        reps, _, ids = self._run_batches(fn, batches)
        return reps, ids


def iter_batches(ids, input_ids, attention_mask, batch_size: int):
    """Slice pre-tokenized arrays into encode batches."""
    n = len(ids)
    for start in range(0, n, batch_size):
        sl = slice(start, min(start + batch_size, n))
        yield {
            "ids": ids[sl],
            "input_ids": input_ids[sl],
            "attention_mask": attention_mask[sl],
        }


# The padded lengths bucketed batches may use: a small fixed menu keeps the
# number of compiled (batch, L) programs bounded (<= 8) while wasting < 33%
# pad FLOPs within a bucket.
LENGTH_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)


def plan_length_buckets(
    lengths, batch_size: int, max_len: int,
    allowed: tuple[int, ...] = LENGTH_BUCKETS,
):
    """Group items into batches padded to per-batch bucket lengths.

    The reference pads every batch to ``max_len`` (driver/encode.py via
    p_max_len), wasting pad FLOPs on short-document corpora (BEIR at
    p_max_len 512).  Sorting by length and padding each batch to the
    smallest allowed bucket >= its longest member cuts encode cost roughly
    by the corpus's mean/max length ratio, while masked positions keep the
    reps semantically identical.

    Returns ``(plan, order)``: ``plan`` is a list of ``(indices, bucket_len)``
    batches over the ORIGINAL item indices; ``order`` is the concatenation of
    all indices in plan order (so outputs can be restored to input order via
    ``np.argsort(order)``).
    """
    lengths = np.minimum(np.asarray(lengths, np.int64), max_len)
    menu = sorted({l for l in allowed if l < max_len} | {max_len})
    order = np.argsort(lengths, kind="stable")
    plan = []
    for start in range(0, len(order), batch_size):
        sel = order[start:start + batch_size]
        need = int(lengths[sel].max(initial=1))
        blen = next(b for b in menu if b >= need)
        plan.append((sel, blen))
    return plan, order


def bucketed_encode_batches(
    ids, toks, batch_size: int, max_len: int,
    cls_id: int | None, sep_id: int | None,
):
    """Length-bucketed encode batches over pre-tokenized texts (no specials).

    The single place that encodes the bucketing invariants shared by the
    ``encode`` CLI verb and the BEIR harness: per-item length is
    ``len(t) + 2`` (the [CLS]/[SEP] budget ``wrap_specials`` will add —
    an over-estimate when either id is None, which only over-sizes a
    bucket, never changes truncation), and each batch wraps/pads to its
    bucket length so reps are identical to the pad-to-``max_len`` path.

    Returns ``(batches, order)``: a generator of ``collate_encode`` batches
    and the item order they cover (outputs restore to input order via
    ``np.argsort(order)``; id-keyed consumers can ignore it).
    """
    from dhr_tpu.data.collate import collate_encode, wrap_specials

    plan, order = plan_length_buckets(
        [len(t) + 2 for t in toks], batch_size, max_len
    )

    def gen():
        for sel, blen in plan:
            yield collate_encode(
                [ids[i] for i in sel],
                [wrap_specials(toks[i], blen, cls_id, sep_id) for i in sel],
                blen,
            )

    return gen(), order


def plan_packing(lengths, row_len: int, max_segments: int):
    """First-fit-decreasing token packing over a length histogram.

    Groups documents into rows of capacity ``row_len`` tokens with at most
    ``max_segments`` documents per row.  Greedy: open a row, repeatedly add
    the longest remaining document that still fits.  The histogram
    formulation (at most ``row_len`` distinct lengths) keeps planning
    O(n log row_len) — flat scans over an 8.8M-doc corpus, where a naive
    first-fit over open bins would be quadratic.

    Returns ``rows``: a list of rows, each a list of ORIGINAL item indices
    in slot order.  Every item appears exactly once; items longer than
    ``row_len`` are planned at ``row_len`` (they get a row to themselves and
    are truncated at collate time, like the plain path's p_max_len cut).

    The C++ twin (``native.plan_packing_native``, same plan item for item —
    pinned by test_native) takes the corpus-scale path: one native pass
    instead of an 8.8M-iteration Python loop.
    """
    import bisect

    from dhr_tpu import native

    planned = native.plan_packing_native(lengths, row_len, max_segments)
    if planned is not None:
        items, offsets = planned
        return [items[offsets[r]:offsets[r + 1]]
                for r in range(len(offsets) - 1)]

    # floor at 1: wrap_specials emits at least one token for an empty item
    # ("t or [0]"), so planning it at 0 could overfill a row at collate time
    lengths = np.clip(np.asarray(lengths, np.int64), 1, row_len)
    by_len: dict[int, list[int]] = {}
    for i, l in enumerate(lengths.tolist()):
        by_len.setdefault(l, []).append(i)
    # FIFO per length keeps plan order stable in input order
    heads = {l: 0 for l in by_len}
    avail = sorted(by_len)  # ascending distinct lengths with items left
    rows = []
    while avail:
        cap = row_len
        row = []
        while len(row) < max_segments:
            j = bisect.bisect_right(avail, cap) - 1
            if j < 0:
                break
            l = avail[j]
            q = by_len[l]
            row.append(q[heads[l]])
            heads[l] += 1
            if heads[l] == len(q):
                avail.pop(j)
            cap -= l
        rows.append(row)
    return rows


def collate_packed(
    rows, ids, toks, batch_rows: int, row_len: int, max_segments: int,
    cls_id: int | None, sep_id: int | None,
):
    """Build one packed batch from planner rows (fixed (B, L)/(B, S) shapes).

    Emits ``input_ids`` / ``segment_ids`` (1..S, 0 = pad) / ``position_ids``
    (restarting at 0 per segment) / ``seg_start`` (each slot's first token
    position) plus ``slot_ids`` — the document ids occupying each row's
    slots.  Rows beyond ``len(rows)`` are left fully padded so every batch
    compiles to the same program.
    """
    from dhr_tpu.data.collate import wrap_specials

    input_ids = np.zeros((batch_rows, row_len), np.int32)
    segment_ids = np.zeros((batch_rows, row_len), np.int32)
    position_ids = np.zeros((batch_rows, row_len), np.int32)
    seg_start = np.zeros((batch_rows, max_segments), np.int32)
    slot_ids = []
    for r, row in enumerate(rows):
        off = 0
        sids = []
        for s, item in enumerate(row):
            t = wrap_specials(toks[item], row_len - off, cls_id, sep_id)
            n = len(t)
            input_ids[r, off:off + n] = t
            segment_ids[r, off:off + n] = s + 1
            position_ids[r, off:off + n] = np.arange(n)
            seg_start[r, s] = off
            sids.append(ids[item])
            off += n
        slot_ids.append(sids)
    while len(slot_ids) < batch_rows:
        slot_ids.append([])
    return {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "position_ids": position_ids,
        "seg_start": seg_start,
        "slot_ids": slot_ids,
    }


def packed_encode_batches(
    ids, toks, batch_rows: int, row_len: int, max_segments: int,
    cls_id: int | None, sep_id: int | None,
):
    """Token-packed encode batches over pre-tokenized texts (no specials).

    Several documents share one transformer row under a block-diagonal
    attention mask and per-segment position ids, so pad FLOPs drop to the
    row-fill slack instead of the per-document pad — the step beyond
    ``bucketed_encode_batches`` for short-document corpora at large
    p_max_len (the reference pads one document per row,
    driver/encode.py via p_max_len).

    Returns ``(batches, order)`` like the bucketed twin: a generator of
    :func:`collate_packed` batches and the document order they emit
    (outputs restore to input order via ``np.argsort(order)``).
    """
    rows = plan_packing(
        [len(t) + 2 for t in toks], row_len, max_segments
    )
    order = np.asarray([i for row in rows for i in row])

    def gen():
        for start in range(0, len(rows), batch_rows):
            yield collate_packed(
                rows[start:start + batch_rows], ids, toks,
                batch_rows, row_len, max_segments, cls_id, sep_id,
            )

    return gen(), order


def make_query_encoder(encoder: Encoder, tokenizer, q_max_len: int,
                       cls_id: int | None, sep_id: int | None):
    """Raw query strings -> (values, indices_or_None) for the serve daemon.

    Queries are chunked to the Encoder's batch size so every call reuses
    the ONE compiled query program — an oversize request must never force
    a fresh XLA compile mid-serve (minutes through a remote-compile link).
    """
    from dhr_tpu.data.collate import collate_encode, wrap_specials

    bs = encoder.encode_cfg.batch_size

    def encode(queries: list[str]):
        toks = [
            tokenizer.encode(q, add_special_tokens=False,
                             max_length=q_max_len, truncation=True)
            for q in queries
        ]
        wrapped = [wrap_specials(t, q_max_len, cls_id, sep_id) for t in toks]

        def batches():
            for start in range(0, len(wrapped), bs):
                chunk = wrapped[start: start + bs]
                yield collate_encode(
                    [str(start + j) for j in range(len(chunk))],
                    chunk, q_max_len,
                )

        values, indices, _ = encoder.encode_queries(batches())
        return values, indices

    return encode
