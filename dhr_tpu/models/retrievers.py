"""The retriever model family: Dense, DHR/DLR, Aggretriever, ColBERT.

One shared transformer encoder (``dhr_tpu.models.transformer``) with
pluggable heads, instead of four near-copies of a modeling file.  Each family
is selected by ``RetrieverConfig.model_type``:

- ``dense``: single-vector bi-encoder, CLS or mean pooling, optional linear
  projector (reference Dense/modeling.py:77-284).
- ``dhr`` / ``dlr``: lexical vocab-space rep from MLM logits —
  ``max_seq(softmax(logits) * term_weight * mask)`` over positions 1.. —
  plus a CLS semantic rep; ``dlr`` is ``dhr`` with the CLS fusion disabled
  (reference DHR/modeling.py:287-347; driver/train.py:124-127).
- ``agg``: same lexical rep (or a scatter-max of raw term weights when
  ``skip_mlm``), aggregated to a fixed dim and concatenated with a projected
  CLS (reference Aggretriever/modeling.py:264-333).
- ``colbert``: per-token projected reps, query rows length-normalized and
  scaled by 32, split into (CLS, rest) for MaxSim scoring (reference
  ColBERT/modeling.py:222-253).

Encoders return a :class:`Reps` pytree; score/loss functions live in
``dhr_tpu.train.loss`` and ``dhr_tpu.retrieval`` so the same encode path
serves training, corpus encoding, and serving.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from dhr_tpu.models.heads import Projector, TermWeightTrans
from dhr_tpu.models.transformer import (
    EncoderConfig,
    EncoderWithMLM,
    TransformerEncoder,
)

MODEL_TYPES = ("dense", "dhr", "dlr", "agg", "colbert")


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    model_type: str = "dhr"
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    untie_encoder: bool = False
    # pooling / projection
    add_pooler: bool = False
    projection_dim: int = 128
    pooling: str = "cls"  # dense family: 'cls' | 'mean'
    # DHR / DLR
    combine_cls: bool = True  # dlr forces False
    dlr_out_dim: int = 768
    # Aggretriever
    agg_dim: int = 640
    semi_aggregate: bool = False
    skip_mlm: bool = False

    def __post_init__(self):
        if self.model_type not in MODEL_TYPES:
            raise ValueError(f"unknown model_type {self.model_type}")
        if self.model_type == "dlr":
            object.__setattr__(self, "combine_cls", False)

    @property
    def needs_mlm(self) -> bool:
        if self.model_type in ("dhr", "dlr"):
            return True
        return self.model_type == "agg" and not self.skip_mlm


class Reps(flax.struct.PyTreeNode):
    """Encoder output bundle; unused fields are None per model family."""

    dense: Optional[jax.Array] = None      # (B, D)         dense / agg merged
    lexical: Optional[jax.Array] = None    # (B, V)         dhr / agg vocab rep
    semantic: Optional[jax.Array] = None   # (B, Dp)        dhr / agg CLS rep
    token: Optional[jax.Array] = None      # (B, L-1, Dp)   colbert tokens
    token_cls: Optional[jax.Array] = None  # (B, 1, Dp)     colbert CLS row


class RetrieverEncoder(nn.Module):
    """Role-agnostic encoder: the same module embeds queries and passages.

    For untied bi-encoders instantiate two of these (see :class:`BiEncoder`).
    """

    cfg: RetrieverConfig

    def setup(self):
        cfg = self.cfg
        if cfg.needs_mlm:
            self.backbone = EncoderWithMLM(cfg.encoder)
        else:
            self.backbone = TransformerEncoder(cfg.encoder)
        if cfg.model_type in ("dhr", "dlr", "agg"):
            self.term_weight = TermWeightTrans(dtype=cfg.encoder.dtype)
        if self._use_pooler:
            self.pooler = Projector(self._pooler_dim, dtype=cfg.encoder.dtype)

    @property
    def _use_pooler(self) -> bool:
        cfg = self.cfg
        if cfg.model_type == "colbert":
            return True  # projection to the ColBERT rep dim
        return cfg.add_pooler

    @property
    def _pooler_dim(self) -> int:
        return self.cfg.projection_dim

    def __call__(self, input_ids, attention_mask, is_query: bool = False,
                 deterministic: bool = True) -> Reps:
        cfg = self.cfg
        if cfg.needs_mlm:
            hidden, logits = self.backbone(
                input_ids, attention_mask, deterministic=deterministic
            )
        else:
            hidden = self.backbone(
                input_ids, attention_mask, deterministic=deterministic
            )
            logits = None

        if cfg.model_type == "dense":
            return self._dense_reps(hidden, attention_mask)
        if cfg.model_type in ("dhr", "dlr"):
            return self._lexical_reps(hidden, logits, input_ids, attention_mask)
        if cfg.model_type == "agg":
            return self._lexical_reps(hidden, logits, input_ids, attention_mask)
        return self._colbert_reps(hidden, attention_mask, is_query)

    # ---- dense -----------------------------------------------------------
    def _dense_reps(self, hidden, attention_mask) -> Reps:
        if self.cfg.pooling == "mean":
            m = attention_mask[..., None].astype(hidden.dtype)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        else:
            pooled = hidden[:, 0]
        if self._use_pooler:
            pooled = self.pooler(pooled)
        return Reps(dense=pooled.astype(jnp.float32))

    # ---- dhr / dlr / agg lexical -----------------------------------------
    def _lexical_reps(self, hidden, logits, input_ids, attention_mask) -> Reps:
        cfg = self.cfg
        cls_hidden = hidden[:, 0]
        tw = self.term_weight(hidden[:, 1:])  # (B, L-1, 1)
        if cfg.needs_mlm:
            # softmax over vocab in f32, weighted by the term weight and the
            # attention mask, max-pooled over sequence positions 1..L-1.
            probs = jax.nn.softmax(logits[:, 1:].astype(jnp.float32), axis=-1)
            mask = attention_mask[:, 1:, None].astype(jnp.float32)
            weighted = probs * tw.astype(jnp.float32) * mask
            lexical = jnp.max(weighted, axis=-2)
        else:
            # skip-MLM: scatter-max raw term weights at the input token ids
            # (reference Aggretriever/modeling.py:282-284; implicit max with
            # the zero init reproduces torch's zeros+scatter+max).
            B = input_ids.shape[0]
            V = cfg.encoder.vocab_size
            lexical = jnp.zeros((B, V), jnp.float32)
            rows = jnp.arange(B)[:, None]
            lexical = lexical.at[rows, input_ids[:, 1:]].max(
                tw[..., 0].astype(jnp.float32)
            )
        semantic = None
        if cfg.model_type in ("dhr", "dlr"):
            semantic = self.pooler(cls_hidden) if self._use_pooler else cls_hidden
            semantic = semantic.astype(jnp.float32)
        elif self._use_pooler:  # agg with CLS projection
            semantic = self.pooler(cls_hidden).astype(jnp.float32)
        return Reps(lexical=lexical, semantic=semantic)

    # ---- colbert -----------------------------------------------------------
    def _colbert_reps(self, hidden, attention_mask, is_query) -> Reps:
        reps = self.pooler(hidden)
        reps = reps * attention_mask[..., None].astype(reps.dtype)
        if is_query:
            q_len = jnp.sum(attention_mask, axis=-1)[:, None, None].astype(
                reps.dtype
            )
            reps = reps / q_len * 32.0
        reps = reps.astype(jnp.float32)
        return Reps(token_cls=reps[:, :1], token=reps[:, 1:])


class BiEncoder(nn.Module):
    """Query/passage bi-encoder; tied by default, untied on request."""

    cfg: RetrieverConfig

    def setup(self):
        self.encoder_q = RetrieverEncoder(self.cfg)
        if self.cfg.untie_encoder:
            self.encoder_p = RetrieverEncoder(self.cfg)
        else:
            self.encoder_p = self.encoder_q

    def __call__(self, query=None, passage=None, deterministic=True):
        """Encode query and/or passage batches.

        Each of ``query``/``passage`` is a dict with ``input_ids`` and
        ``attention_mask``.  Returns ``(q_reps, p_reps)`` with None for
        absent sides.
        """
        q_reps = p_reps = None
        if query is not None:
            q_reps = self.encoder_q(
                query["input_ids"], query["attention_mask"],
                is_query=True, deterministic=deterministic,
            )
        if passage is not None:
            p_reps = self.encoder_p(
                passage["input_ids"], passage["attention_mask"],
                is_query=False, deterministic=deterministic,
            )
        return q_reps, p_reps
