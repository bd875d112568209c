"""Optimizer factory: AdamW + linear warmup/decay + parameter masking.

Parity targets:
- linear warmup to ``lr`` then linear decay to 0 over the run
  (reference driver/jax_train.py:152-166);
- weight decay masked off LayerNorm scales and biases
  (driver/jax_train.py:169-199);
- frozen word embeddings for the DHR family (DHR/modeling.py:412-415),
  implemented as a zero-update mask instead of ``requires_grad`` surgery.
"""

from __future__ import annotations

import dataclasses

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 5e-6
    warmup_steps: int = 0
    total_steps: int = 100_000
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float | None = None
    freeze_word_embeddings: bool = False


def linear_warmup_decay(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, max(cfg.warmup_steps, 1))
    decay = optax.linear_schedule(
        cfg.learning_rate, 0.0, max(cfg.total_steps - cfg.warmup_steps, 1)
    )
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def _path_contains(path, *needles: str) -> bool:
    keys = [getattr(k, "key", str(k)) for k in path]
    return any(any(n in str(k) for k in keys) for n in needles)


def decay_mask(params) -> dict:
    """True where weight decay applies: everything except LN scales + biases."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _path_contains(path, "layer_norm", "bias", "scale"),
        params,
    )


def frozen_word_embedding_mask(params) -> dict:
    """True for word-embedding tables (params to freeze)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_contains(path, "word"),
        params,
    )


def make_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(cfg)
    chain = []
    if cfg.max_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(
        optax.adamw(
            schedule,
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask(params),
        )
    )
    tx = optax.chain(*chain)
    if cfg.freeze_word_embeddings:
        frozen = frozen_word_embedding_mask(params)
        tx = optax.multi_transform(
            {True: optax.set_to_zero(), False: tx},
            jax.tree.map(bool, frozen),
        )
    return tx
