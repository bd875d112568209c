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
