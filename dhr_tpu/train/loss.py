"""Training losses for the retriever family.

All functions are pure and operate on *global* batches: under ``jit`` with a
data-sharded batch and replicated params, the listwise score matrix
``(B, B*n)`` is computed over every query/passage in the global batch — XLA
inserts the all-gathers that the reference performs manually with NCCL
``all_gather`` + re-inserted local tensors (reference DHR/modeling.py:443-454,
tevax/loss.py:13-21).  There is therefore no label-offset bookkeeping and no
``loss * world_size`` correction (the reference needs both to undo DDP's
gradient averaging, trainer.py:65-66); the configurable ``loss_scale`` can
reproduce the reference's effective scaling when exact optimizer-trajectory
parity is wanted.

Score semantics parity:
- listwise scores: DHR/modeling.py:265-285 (IP and densified GIP variants).
- one-hot KL == CE with positives at column ``b * n_passages``
  (DHR/modeling.py:188-197).
- TCT knowledge distillation: KL vs ColBERT teacher at temperature splits
  1 / 3/4 / 1/4 for fused / semantic / lexical (DHR/modeling.py:176-187).
- Aggretriever component regularization: fused + 0.5 lexical + 0.5 semantic
  (Aggretriever/modeling.py:200-213).
- ColBERT MaxSim + margin-KD with -20-padded teacher rows
  (ColBERT/modeling.py:141-160, 204-219).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhr_tpu.ops import aggregate, densify, gip_scores_masked


# --------------------------------------------------------------------------
# score matrices (global listwise)
# --------------------------------------------------------------------------


def listwise_ip(q_reps: jax.Array, p_reps: jax.Array) -> jax.Array:
    """(B, D) x (B*n, D) -> (B, B*n) inner-product scores, f32."""
    return jnp.dot(
        q_reps.astype(jnp.float32), p_reps.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def listwise_gip(
    q_lexical: jax.Array, p_lexical: jax.Array, dlr_out_dim: int,
    remove_dims: int = 570,
) -> jax.Array:
    """Densified gated-inner-product listwise scores (training twin).

    Differentiable through the fold-max values (the argmax gate carries no
    gradient, matching autograd through torch ``max``).
    """
    qv, qi = densify(q_lexical, dlr_out_dim, remove_dims)
    pv, pi = densify(p_lexical, dlr_out_dim, remove_dims)
    return gip_scores_masked(qv, qi, pv, pi)


def listwise_maxsim(q_tokens: jax.Array, p_tokens: jax.Array) -> jax.Array:
    """ColBERT MaxSim: (B, Lq, D) x (M, Lp, D) -> (B, M).

    Zero rows (padded positions) contribute max >= 0 per query token only via
    genuine similarities because padded passage rows are zeroed at encode
    time; padded *query* rows contribute 0 to the sum.
    """
    sim = jnp.einsum(
        "aik,bjk->abij",
        q_tokens.astype(jnp.float32), p_tokens.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(jnp.max(sim, axis=-1), axis=-1)


def pairwise_maxsim(q_tokens: jax.Array, p_tokens: jax.Array) -> jax.Array:
    """Row-aligned MaxSim: (B, Lq, D) x (B, Lp, D) -> (B,)."""
    sim = jnp.einsum(
        "bik,bjk->bij",
        q_tokens.astype(jnp.float32), p_tokens.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(jnp.max(sim, axis=-1), axis=-1)


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------


def positive_columns(num_queries: int, n_passages: int) -> jax.Array:
    """Column of each query's positive in the listwise score matrix."""
    return jnp.arange(num_queries) * n_passages


def kl_onehot(scores: jax.Array, n_passages: int) -> jax.Array:
    """Mean KL(log_softmax(scores) || one_hot) == softmax CE on positives."""
    labels = positive_columns(scores.shape[0], n_passages)
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def kl_vs_teacher(scores: jax.Array, teacher_scores: jax.Array,
                  temperature: float = 1.0) -> jax.Array:
    """Batch-mean KL(log_softmax(student) || softmax(teacher * T))."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    t = jax.nn.softmax(teacher_scores * temperature, axis=-1)
    per_row = jnp.sum(t * (jnp.log(jnp.clip(t, 1e-30)) - logp), axis=-1)
    return jnp.mean(per_row)


def expand_teacher_margins(teacher_scores: jax.Array, num_total_passages: int,
                           fill_value: float = -20.0) -> jax.Array:
    """Place per-query teacher scores (B, n) on their listwise block diagonal.

    Row ``b`` of the result has ``teacher_scores[b]`` at columns
    ``b*n .. b*n + n - 1`` and ``fill_value`` elsewhere — the dense layout the
    reference builds with its pad/flatten/reshape stride trick
    (ColBERT/modeling.py:146-148).
    """
    B, n = teacher_scores.shape
    cols = jnp.arange(num_total_passages)[None, :]
    base = (jnp.arange(B) * n)[:, None]
    offset = cols - base
    in_block = (offset >= 0) & (offset < n)
    gathered = jnp.take_along_axis(
        teacher_scores, jnp.clip(offset, 0, n - 1), axis=-1
    )
    return jnp.where(in_block, gathered, fill_value)


def dense_contrastive_loss(q_reps, p_reps, n_passages: int,
                           loss_scale: float = 1.0) -> jax.Array:
    """In-batch-negative CE for the dense family (loss.py:7-40 semantics)."""
    scores = listwise_ip(q_reps, p_reps)
    return kl_onehot(scores, n_passages) * loss_scale


def _dhr_kl(scores, lexical_scores, semantic_scores, n_passages,
            teacher_scores, temperature):
    """The DHR KL combination (one-hot or TCT temperature splits)."""
    if teacher_scores is not None:
        loss = kl_vs_teacher(scores, teacher_scores, temperature)
        loss += 0.5 * kl_vs_teacher(
            semantic_scores, teacher_scores, temperature * 3 / 4
        )
        loss += 0.5 * kl_vs_teacher(
            lexical_scores, teacher_scores, temperature * 1 / 4
        )
    else:
        loss = kl_onehot(scores, n_passages)
    return loss


def dhr_loss(
    q_reps, p_reps, n_passages: int,
    dlr_out_dim: int | None = 768,
    combine_cls: bool = True,
    remove_dims: int = 570,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """DHR/DLR loss: fused lexical+semantic listwise KL (one-hot or TCT-KD).

    Returns ``(loss, scores)``.
    """
    if dlr_out_dim is not None:
        lexical_scores = listwise_gip(
            q_reps.lexical, p_reps.lexical, dlr_out_dim, remove_dims
        )
    else:
        lexical_scores = listwise_ip(q_reps.lexical, p_reps.lexical)
    semantic_scores = listwise_ip(q_reps.semantic, p_reps.semantic)
    lamb = 1.0 if combine_cls else 0.0
    scores = lexical_scores + lamb * semantic_scores
    loss = _dhr_kl(scores, lexical_scores, semantic_scores, n_passages,
                   teacher_scores, temperature)
    return loss * loss_scale, scores


def dhr_loss_packed(
    q_reps, p_values, p_indices, p_semantic, n_passages: int,
    combine_cls: bool = True,
    dlr_out_dim: int = 768,
    remove_dims: int = 570,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """DHR/DLR loss over a token-packed passage tower.

    The packed forward already produced per-passage DENSIFIED planes
    (``p_values``/``p_indices``) — the two-level fold (per-token densify,
    segment max) selects the same (token, fold) winner as densifying the
    token-maxed vocab plane, so values AND gradients match the plain path
    up to float near-ties.  Only the GIP variant exists here (the raw
    (B, V) plane is never materialized under packing).
    """
    qv, qi = densify(q_reps.lexical, dlr_out_dim, remove_dims)
    lexical_scores = gip_scores_masked(qv, qi, p_values, p_indices)
    semantic_scores = listwise_ip(q_reps.semantic, p_semantic)
    lamb = 1.0 if combine_cls else 0.0
    scores = lexical_scores + lamb * semantic_scores
    loss = _dhr_kl(scores, lexical_scores, semantic_scores, n_passages,
                   teacher_scores, temperature)
    return loss * loss_scale, scores


def agg_loss(
    q_reps, p_reps, n_passages: int,
    agg_dim: int = 640,
    semi_aggregate: bool = False,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """Aggretriever loss: fused KL + 0.5 lexical KL + 0.5 semantic KL."""
    q_tok = aggregate(q_reps.lexical, agg_dim, full=not semi_aggregate)
    p_tok = aggregate(p_reps.lexical, agg_dim, full=not semi_aggregate)
    return _agg_kl(
        listwise_ip(q_tok, p_tok),
        listwise_ip(q_reps.semantic, p_reps.semantic)
        if q_reps.semantic is not None else None,
        n_passages, teacher_scores, temperature, loss_scale,
    )


def agg_loss_packed(
    q_reps, p_tok, p_semantic, n_passages: int,
    agg_dim: int = 640,
    semi_aggregate: bool = False,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """Aggretriever loss over a token-packed passage tower.

    ``p_tok`` is already aggregated (the packed forward folds per token and
    segment-maxes, equivalent to aggregating the token-maxed plane); only
    the query side aggregates here.
    """
    q_tok = aggregate(q_reps.lexical, agg_dim, full=not semi_aggregate)
    return _agg_kl(
        listwise_ip(q_tok, p_tok),
        listwise_ip(q_reps.semantic, p_semantic)
        if q_reps.semantic is not None and p_semantic is not None else None,
        n_passages, teacher_scores, temperature, loss_scale,
    )


def _agg_kl(lexical_scores, semantic_scores, n_passages, teacher_scores,
            temperature, loss_scale):
    has_semantic = semantic_scores is not None
    if has_semantic:
        scores = lexical_scores + semantic_scores
    else:
        scores = lexical_scores
    if teacher_scores is not None:
        loss = kl_vs_teacher(scores, teacher_scores, temperature)
        if has_semantic:
            loss += 0.5 * kl_vs_teacher(
                semantic_scores, teacher_scores, temperature * 3 / 4
            )
        loss += 0.5 * kl_vs_teacher(
            lexical_scores, teacher_scores, temperature * 1 / 4
        )
    else:
        loss = kl_onehot(scores, n_passages)
        if has_semantic:
            loss += 0.5 * kl_onehot(lexical_scores, n_passages)
            loss += 0.5 * kl_onehot(semantic_scores, n_passages)
    return loss * loss_scale, scores


def colbert_loss(
    q_reps, p_reps, n_passages: int,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """ColBERT loss: MaxSim(token) + MaxSim(cls) scores, CE or margin-KD."""
    scores = listwise_maxsim(q_reps.token, p_reps.token) + listwise_maxsim(
        q_reps.token_cls, p_reps.token_cls
    )
    if teacher_scores is not None:
        expanded = expand_teacher_margins(
            teacher_scores * temperature, scores.shape[1]
        )
        loss = kl_vs_teacher(scores, expanded, 1.0)
    else:
        loss = kl_onehot(scores, n_passages)
    return loss * loss_scale, scores


def colbert_loss_packed(
    q_reps, packed_tok, segment_ids, position_ids, seg_start, slot_pos,
    n_passages: int, p_len: int,
    teacher_scores: jax.Array | None = None,
    temperature: float = 1.0,
    loss_scale: float = 1.0,
):
    """Packed-passage twin of :func:`colbert_loss`.

    ``packed_tok`` is the packed row plane ``(B, L, D)`` from
    ``encode_tokens_packed`` (pads zeroed, each segment laid out
    ``[CLS], t1, ...``).  MaxSim runs directly on the packed layout — the
    per-passage padded reps are never materialized: one
    ``(Q, B, Lq, L)`` similarity plane, then a masked max per slot.  This
    also removes pad FLOPs from the similarity einsum itself (packed rows
    carry ~row-fill real tokens vs the plain path's per-passage padding).

    Exact-parity detail: the plain path's padded positions are zero
    VECTORS, so each of its maxes has a 0-score candidate whenever the
    passage is shorter than ``p_len`` (reference ColBERT/modeling.py
    masks reps to zero, then maxes over all positions).  The packed masked
    max floors at 0 only for those slots (``token count < p_len - 1``);
    full-length passages keep their genuine (possibly negative) max.
    """
    Q = q_reps.token.shape[0]
    B, S = seg_start.shape
    ptok = packed_tok.astype(jnp.float32)
    sim = jnp.einsum(
        "qik,blk->qbil",
        q_reps.token.astype(jnp.float32), ptok,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Q, B, Lq, L)
    tok_ok = (segment_ids > 0) & (position_ids > 0)  # (B, L)
    neg = jnp.float32(-jnp.inf)
    slot_max, slot_cnt = [], []
    for s in range(S):
        m = ((segment_ids == (s + 1)) & tok_ok)[None, :, None, :]
        slot_max.append(jnp.max(jnp.where(m, sim, neg), axis=-1))  # (Q,B,Lq)
        slot_cnt.append(jnp.sum(m[0, :, 0, :], axis=-1))  # (B,)
    mx = jnp.stack(slot_max, axis=2)  # (Q, B, S, Lq)
    cnt = jnp.stack(slot_cnt, axis=1)  # (B, S)
    has_pad = (cnt < (p_len - 1))[None, :, :, None]
    mx = jnp.where(has_pad, jnp.maximum(mx, 0.0), mx)
    # empty slots are all -inf after the mask; zero them (their columns are
    # never selected by slot_pos, this only keeps the sum finite)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    tok_scores = jnp.sum(mx, axis=-1).reshape(Q, B * S)[:, slot_pos]

    cls_p = jnp.take_along_axis(
        ptok, seg_start[:, :, None], axis=1
    ).reshape(B * S, -1)[slot_pos]  # (P, D)
    cls_scores = jnp.einsum(
        "qk,pk->qp", q_reps.token_cls[:, 0].astype(jnp.float32), cls_p,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = tok_scores + cls_scores
    if teacher_scores is not None:
        expanded = expand_teacher_margins(
            teacher_scores * temperature, scores.shape[1]
        )
        loss = kl_vs_teacher(scores, expanded, 1.0)
    else:
        loss = kl_onehot(scores, n_passages)
    return loss * loss_scale, scores


def colbert_teacher_scores(q_reps, p_reps) -> jax.Array:
    """Listwise teacher scores for TCT distillation (stop-gradient)."""
    scores = listwise_maxsim(q_reps.token, p_reps.token) + listwise_maxsim(
        q_reps.token_cls, p_reps.token_cls
    )
    return jax.lax.stop_gradient(scores)
