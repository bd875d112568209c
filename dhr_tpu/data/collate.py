"""Fixed-shape NumPy collation.

XLA compiles one program per shape, so every batch is padded to the static
``(batch, max_len)`` envelope — the reference pads to max_length through the
HF tokenizer for the same reason on its JAX path (driver/jax_train.py:121-150,
data.py:296-324 QPCollator semantics: flatten passage groups, prepend 0 to
teacher scores for the positive column).
"""

from __future__ import annotations

import numpy as np


def wrap_specials(
    tokens: list[int], max_len: int,
    cls_id: int | None = None, sep_id: int | None = None,
) -> list[int]:
    """[CLS] + tokens + [SEP], truncated so the total fits ``max_len``.

    The interchange corpora store ids WITHOUT specials (reference
    tokenize_corpus.py:29, add_special_tokens=False) and the datasets re-add
    them via ``encode_plus`` (reference data.py:37-46); this is that step.
    """
    budget = max_len - (cls_id is not None) - (sep_id is not None)
    t = list(tokens[:budget])
    if cls_id is not None:
        t = [cls_id] + t
    if sep_id is not None:
        t = t + [sep_id]
    return t or [0]


def pad_token_batch(
    token_lists: list[list[int]], max_len: int, pad_id: int = 0,
    cls_id: int | None = None, sep_id: int | None = None,
) -> dict[str, np.ndarray]:
    """Pad ragged token-id lists to ``(B, max_len)`` ids + attention mask,
    optionally wrapping each row in special tokens first."""
    B = len(token_lists)
    input_ids = np.full((B, max_len), pad_id, np.int32)
    mask = np.zeros((B, max_len), np.int32)
    for i, toks in enumerate(token_lists):
        t = wrap_specials(toks, max_len, cls_id, sep_id)
        input_ids[i, : len(t)] = t
        mask[i, : len(t)] = 1
    return {"input_ids": input_ids, "attention_mask": mask}


def collate_train(
    examples: list[tuple[list[int], list[list[int]], list[float] | None]],
    q_max_len: int, p_max_len: int, pad_id: int = 0,
    cls_id: int | None = None, sep_id: int | None = None,
) -> dict:
    """(query, passages, scores) examples -> one fixed-shape train batch."""
    queries = [q for q, _, _ in examples]
    passages = [p for _, ps, _ in examples for p in ps]
    batch = {
        "query": pad_token_batch(queries, q_max_len, pad_id, cls_id, sep_id),
        "passage": pad_token_batch(passages, p_max_len, pad_id, cls_id, sep_id),
    }
    if examples[0][2] is not None:
        batch["teacher_scores"] = np.asarray(
            [[0.0] + list(s) for _, _, s in examples], np.float32
        )
    return batch


def collate_encode(
    ids: list, token_lists: list[list[int]], max_len: int, pad_id: int = 0
) -> dict:
    b = pad_token_batch(token_lists, max_len, pad_id)
    b["ids"] = list(ids)
    return b


def collate_train_packed(
    examples: list[tuple[list[int], list[list[int]], list[float] | None]],
    q_max_len: int, p_max_len: int,
    pack_rows: int, pack_segments: int,
    pad_id: int = 0,
    cls_id: int | None = None, sep_id: int | None = None,
) -> dict:
    """Train batch with the passage tower token-packed.

    Queries collate exactly like :func:`collate_train`; passages pack
    several-per-row under ``pack_rows`` x ``p_max_len`` (block-diagonal
    attention downstream).  The batch carries ``packed_passage`` instead of
    ``passage``: the packed id/segment/position/seg_start arrays plus
    ``slot_pos`` — passage k (in the plain flatten order the loss expects)
    lives at flat slot ``slot_pos[k]`` of the ``(pack_rows*pack_segments,)``
    per-slot outputs.

    A batch whose packing plan needs more than ``pack_rows`` rows falls
    back to the degenerate one-passage-per-row layout (``num_passages``
    rows) — a second, bounded program shape instead of a mid-run failure.
    """
    from dhr_tpu.encode import collate_packed, plan_packing

    queries = [q for q, _, _ in examples]
    passages = [p for _, ps, _ in examples for p in ps]
    rows = plan_packing(
        [len(t) + (cls_id is not None) + (sep_id is not None)
         for t in passages],
        p_max_len, pack_segments,
    )
    if len(rows) > pack_rows:
        rows = [[i] for i in range(len(passages))]
        pack_rows = len(passages)
    packed = collate_packed(
        rows, list(range(len(passages))), passages,
        pack_rows, p_max_len, pack_segments, cls_id, sep_id,
    )
    slot_pos = np.zeros(len(passages), np.int32)
    for r, row in enumerate(rows):
        for s, item in enumerate(row):
            slot_pos[item] = r * pack_segments + s
    batch = {
        "query": pad_token_batch(queries, q_max_len, pad_id, cls_id, sep_id),
        "packed_passage": {
            "input_ids": packed["input_ids"],
            "segment_ids": packed["segment_ids"],
            "position_ids": packed["position_ids"],
            "seg_start": packed["seg_start"],
            "slot_pos": slot_pos,
        },
    }
    if examples[0][2] is not None:
        batch["teacher_scores"] = np.asarray(
            [[0.0] + list(s) for _, _, s in examples], np.float32
        )
    return batch
