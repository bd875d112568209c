"""Fixed-shape NumPy collation.

XLA compiles one program per shape, so every batch is padded to the static
``(batch, max_len)`` envelope — the reference pads to max_length through the
HF tokenizer for the same reason on its JAX path (driver/jax_train.py:121-150,
data.py:296-324 QPCollator semantics: flatten passage groups, prepend 0 to
teacher scores for the positive column).
"""

from __future__ import annotations

import numpy as np


def pad_token_batch(
    token_lists: list[list[int]], max_len: int, pad_id: int = 0,
    add_special: tuple[int, ...] = (),
) -> dict[str, np.ndarray]:
    """Pad ragged token-id lists to ``(B, max_len)`` ids + attention mask."""
    B = len(token_lists)
    input_ids = np.full((B, max_len), pad_id, np.int32)
    mask = np.zeros((B, max_len), np.int32)
    for i, toks in enumerate(token_lists):
        t = list(add_special[:1]) + list(toks) if add_special else list(toks)
        t = t[:max_len]
        input_ids[i, : len(t)] = t
        mask[i, : len(t)] = 1
    return {"input_ids": input_ids, "attention_mask": mask}


def collate_train(
    examples: list[tuple[list[int], list[list[int]], list[float] | None]],
    q_max_len: int, p_max_len: int, pad_id: int = 0,
) -> dict:
    """(query, passages, scores) examples -> one fixed-shape train batch."""
    queries = [q for q, _, _ in examples]
    passages = [p for _, ps, _ in examples for p in ps]
    batch = {
        "query": pad_token_batch(queries, q_max_len, pad_id),
        "passage": pad_token_batch(passages, p_max_len, pad_id),
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
