"""Jitted train steps: standard and gradient-cache.

The standard step is compiled once over the mesh with the batch sharded on
the ``data`` axis and params replicated; listwise losses over the global
batch make XLA insert the ICI all-gathers (no manual collectives, no label
offsets — contrast reference tevax/loss.py:13-21).

The gradient-cache step decouples the contrastive batch from device memory
with the classic two-pass scheme (reference trainer.py:88-118 and
tevax/training.py:70-102, re-derived functionally):

1. encode all chunks without gradients;
2. differentiate the loss w.r.t. the *representations* only;
3. re-encode each chunk under ``jax.vjp`` and pull the cached rep-gradients
   back to param gradients, accumulating across chunks with ``lax.scan`` so
   only one chunk's activations are ever live.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from dhr_tpu.models.retrievers import BiEncoder, Reps, RetrieverConfig
from dhr_tpu.train import loss as losses
from dhr_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class LossConfig:
    n_passages: int = 8
    temperature: float = 1.0
    loss_scale: float = 1.0
    use_tct_teacher: bool = False  # distill from an in-graph ColBERT teacher
    remove_dims: int = 570


def compute_loss(
    cfg: RetrieverConfig,
    loss_cfg: LossConfig,
    q_reps: Reps,
    p_reps: Reps,
    teacher_scores: jax.Array | None,
):
    """Dispatch to the per-family loss; returns (loss, scores)."""
    if cfg.model_type == "dense":
        scores = losses.listwise_ip(q_reps.dense, p_reps.dense)
        loss = losses.kl_onehot(scores, loss_cfg.n_passages)
        return loss * loss_cfg.loss_scale, scores
    if cfg.model_type in ("dhr", "dlr"):
        return losses.dhr_loss(
            q_reps, p_reps, loss_cfg.n_passages,
            dlr_out_dim=cfg.dlr_out_dim,
            combine_cls=cfg.combine_cls,
            remove_dims=loss_cfg.remove_dims,
            teacher_scores=teacher_scores,
            temperature=loss_cfg.temperature,
            loss_scale=loss_cfg.loss_scale,
        )
    if cfg.model_type == "agg":
        return losses.agg_loss(
            q_reps, p_reps, loss_cfg.n_passages,
            agg_dim=cfg.agg_dim,
            semi_aggregate=cfg.semi_aggregate,
            teacher_scores=teacher_scores,
            temperature=loss_cfg.temperature,
            loss_scale=loss_cfg.loss_scale,
        )
    if cfg.model_type == "colbert":
        return losses.colbert_loss(
            q_reps, p_reps, loss_cfg.n_passages,
            teacher_scores=teacher_scores,
            temperature=loss_cfg.temperature,
            loss_scale=loss_cfg.loss_scale,
        )
    raise ValueError(cfg.model_type)


def make_train_step(
    model: BiEncoder,
    cfg: RetrieverConfig,
    loss_cfg: LossConfig,
    teacher_apply: Callable[..., tuple[Reps, Reps]] | None = None,
) -> Callable:
    """Build the standard train step.

    ``teacher_apply(query, passage) -> (q_reps, p_reps)`` provides an
    in-graph ColBERT teacher for TCT distillation; its scores are
    stop-gradient (reference DHR/modeling.py:176-187).
    """

    def loss_fn(params, batch, dropout_rng):
        q_reps, p_reps = model.apply(
            {"params": params},
            query=batch["query"],
            passage=batch["passage"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        teacher_scores = batch.get("teacher_scores")
        if loss_cfg.use_tct_teacher and teacher_apply is not None:
            tq, tp = teacher_apply(batch["query"], batch["passage"])
            teacher_scores = losses.colbert_teacher_scores(tq, tp)
        return compute_loss(cfg, loss_cfg, q_reps, p_reps, teacher_scores)

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng
        )
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return train_step


def make_packed_train_step(
    model: BiEncoder,
    cfg: RetrieverConfig,
    loss_cfg: LossConfig,
) -> Callable:
    """Train step with a token-packed passage tower.

    Consumes batches from ``collate_train_packed``: the passage tower runs
    the block-diagonal packed forward (several passages per row — the pad
    FLOPs the reference spends on every sub-``p_max_len`` passage disappear)
    and already emits per-passage reduced reps (densified for dhr/dlr,
    aggregated for agg, pooled for dense); ``slot_pos`` restores the plain
    flatten order the listwise losses expect.  Gradients match the plain
    step up to float near-ties (the two-level fold selects the same winner)
    — dropout masks differ by layout, an equally-valid sample of the same
    distribution.

    colbert packs too: MaxSim runs directly on the packed token plane
    (``colbert_loss_packed``) — per-passage padded reps never materialize,
    and the similarity einsum itself skips the pad FLOPs.

    Unsupported here: the in-graph TCT teacher (it would need its own plain
    passage batch), dlr_out_dim None (the raw (B, V) plane is never
    materialized), and grad-cache (pack the chunks instead by lowering
    pack_rows).  Data-provided ``teacher_scores`` work unchanged.
    """
    if cfg.model_type not in ("dense", "dhr", "dlr", "agg", "colbert"):
        raise ValueError(
            f"packed training supports dense/dhr/dlr/agg/colbert, not "
            f"{cfg.model_type}"
        )
    if cfg.model_type == "agg" and cfg.skip_mlm:
        raise ValueError(
            "packed training does not support agg skip_mlm (the plain "
            "path's pad-position scatter cannot be reproduced in packed "
            "rows — see RetrieverEncoder.encode_packed)"
        )
    if loss_cfg.use_tct_teacher:
        raise ValueError(
            "packed training does not support the in-graph TCT teacher; "
            "pass teacher scores through the data instead"
        )
    if cfg.model_type in ("dhr", "dlr") and cfg.dlr_out_dim is None:
        raise ValueError("packed training needs dlr_out_dim (GIP variant)")

    def loss_fn(params, batch, dropout_rng):
        q_rng, p_rng = jax.random.split(dropout_rng)
        q_reps, _ = model.apply(
            {"params": params},
            query=batch["query"],
            passage=None,
            deterministic=False,
            rngs={"dropout": q_rng},
        )
        pp = batch["packed_passage"]
        if cfg.model_type == "colbert":
            packed_tok = model.apply(
                {"params": params},
                pp["input_ids"], pp["segment_ids"], pp["position_ids"],
                deterministic=False,
                method="encode_tokens_packed",
                rngs={"dropout": p_rng},
            )
            return losses.colbert_loss_packed(
                q_reps, packed_tok, pp["segment_ids"], pp["position_ids"],
                pp["seg_start"], pp["slot_pos"], loss_cfg.n_passages,
                p_len=pp["input_ids"].shape[1],
                teacher_scores=batch.get("teacher_scores"),
                temperature=loss_cfg.temperature,
                loss_scale=loss_cfg.loss_scale,
            )
        vals, idxs, semantic = model.apply(
            {"params": params},
            pp["input_ids"], pp["segment_ids"], pp["position_ids"],
            pp["seg_start"],
            cfg.dlr_out_dim, loss_cfg.remove_dims,
            deterministic=False,
            method="encode_passages_packed",
            rngs={"dropout": p_rng},
        )
        B, S = pp["seg_start"].shape
        slot_pos = pp["slot_pos"]

        def take(x):
            return x.reshape(B * S, *x.shape[2:])[slot_pos]

        teacher_scores = batch.get("teacher_scores")
        if cfg.model_type == "dense":
            scores = losses.listwise_ip(q_reps.dense, take(vals))
            loss = losses.kl_onehot(scores, loss_cfg.n_passages)
            return loss * loss_cfg.loss_scale, scores
        if cfg.model_type in ("dhr", "dlr"):
            return losses.dhr_loss_packed(
                q_reps, take(vals), take(idxs), take(semantic),
                loss_cfg.n_passages,
                combine_cls=cfg.combine_cls,
                dlr_out_dim=cfg.dlr_out_dim,
                remove_dims=loss_cfg.remove_dims,
                teacher_scores=teacher_scores,
                temperature=loss_cfg.temperature,
                loss_scale=loss_cfg.loss_scale,
            )
        return losses.agg_loss_packed(
            q_reps, take(vals),
            take(semantic) if semantic is not None else None,
            loss_cfg.n_passages,
            agg_dim=cfg.agg_dim,
            semi_aggregate=cfg.semi_aggregate,
            teacher_scores=teacher_scores,
            temperature=loss_cfg.temperature,
            loss_scale=loss_cfg.loss_scale,
        )

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng
        )
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return train_step


# --------------------------------------------------------------------------
# gradient cache
# --------------------------------------------------------------------------


def _tree_chunk(tree, num_chunks: int):
    """Reshape every leaf (B, ...) -> (num_chunks, B/num_chunks, ...)."""
    return jax.tree.map(
        lambda x: x.reshape(num_chunks, x.shape[0] // num_chunks, *x.shape[1:]),
        tree,
    )


def _tree_unchunk(tree):
    return jax.tree.map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), tree
    )


def make_grad_cache_train_step(
    model: BiEncoder,
    cfg: RetrieverConfig,
    loss_cfg: LossConfig,
    q_chunks: int = 4,
    p_chunks: int = 8,
    teacher_apply: Callable[..., tuple[Reps, Reps]] | None = None,
) -> Callable:
    """Build the two-pass gradient-cache train step.

    ``q_chunks``/``p_chunks`` split the per-step query/passage batches; only
    one chunk's encoder activations are live at a time in either pass.
    An in-graph TCT teacher (``teacher_apply``) runs once in the no-grad
    pass; its scores feed the rep-level loss like any data-provided scores.
    """

    def encode_chunks(params, chunked, is_query, rng):
        def one(i, chunk):
            return model.apply(
                {"params": params},
                query=chunk if is_query else None,
                passage=None if is_query else chunk,
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, i)},
            )

        def mapped(args):
            i, chunk = args
            q, p = one(i, chunk)
            return q if is_query else p

        n = jax.tree.leaves(chunked)[0].shape[0]
        idx = jnp.arange(n)
        return jax.lax.map(mapped, (idx, chunked))

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        q_rng, p_rng = jax.random.split(rng)
        qc = _tree_chunk(batch["query"], q_chunks)
        pc = _tree_chunk(batch["passage"], p_chunks)

        # pass 1: representations without gradient tracking
        q_reps = _tree_unchunk(encode_chunks(state.params, qc, True, q_rng))
        p_reps = _tree_unchunk(encode_chunks(state.params, pc, False, p_rng))

        teacher_scores = batch.get("teacher_scores")
        if loss_cfg.use_tct_teacher and teacher_apply is not None:
            from dhr_tpu.train.loss import colbert_teacher_scores

            tq, tp = teacher_apply(batch["query"], batch["passage"])
            teacher_scores = colbert_teacher_scores(tq, tp)

        def rep_loss(qr, pr):
            return compute_loss(cfg, loss_cfg, qr, pr, teacher_scores)

        (loss, _), (q_grads, p_grads) = jax.value_and_grad(
            rep_loss, argnums=(0, 1), has_aux=True
        )(q_reps, p_reps)

        # pass 2: re-encode per chunk under vjp, pull cached rep grads back
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)

        def side_grads(chunked, rep_grads_chunked, is_query, side_rng, acc):
            n = jax.tree.leaves(chunked)[0].shape[0]

            def body(carry, args):
                i, chunk, rep_grad = args

                def enc(params):
                    q, p = model.apply(
                        {"params": params},
                        query=chunk if is_query else None,
                        passage=None if is_query else chunk,
                        deterministic=False,
                        rngs={"dropout": jax.random.fold_in(side_rng, i)},
                    )
                    return q if is_query else p

                _, vjp = jax.vjp(enc, state.params)
                (g,) = vjp(rep_grad)
                return jax.tree.map(jnp.add, carry, g), None

            idx = jnp.arange(n)
            acc, _ = jax.lax.scan(body, acc, (idx, chunked, rep_grads_chunked))
            return acc

        grads = side_grads(qc, _tree_chunk(q_grads, q_chunks), True, q_rng,
                           zero_grads)
        grads = side_grads(pc, _tree_chunk(p_grads, p_chunks), False, p_rng,
                           grads)

        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return train_step
