"""Flax transformer encoder with optional MLM head.

One encoder module serves every retrieval model in the framework (Dense,
DHR/DLR, Aggretriever, ColBERT).  The architecture is weight-compatible with
HF BERT/DistilBERT encoders — ``dhr_tpu.models.hf_io`` maps HF checkpoints
(e.g. distilbert-base-uncased, jacklin/DeLADE-CLS-P) onto this param tree —
but the implementation is TPU-first:

- parameters live in f32; activations compute in a configurable dtype
  (bf16 by default on TPU) so matmuls hit the MXU at full rate;
- attention is a fused dot-product-attention with an additive mask, no
  data-dependent shapes;
- optional ``remat`` wraps each layer in ``jax.checkpoint`` to trade FLOPs
  for HBM when encoding long passages with the 30522-wide MLM head alive.

Functional equivalence target (not a port): the encoder stack driven by the
reference via ``AutoModelForMaskedLM`` (see reference tevatron/DHR/
modeling.py:291-316 for how hidden states + logits are consumed).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Architecture config covering BERT- and DistilBERT-family encoders."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 0  # 0 => no token-type embeddings (DistilBERT)
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Any = jnp.bfloat16  # activation/compute dtype
    remat: bool = False

    @staticmethod
    def distilbert_base() -> "EncoderConfig":
        return EncoderConfig()

    @staticmethod
    def bert_base() -> "EncoderConfig":
        return EncoderConfig(num_layers=12, type_vocab_size=2)

    @staticmethod
    def tiny(vocab_size: int = 1024, **kw) -> "EncoderConfig":
        """A fast config for tests."""
        return EncoderConfig(
            vocab_size=vocab_size,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=64,
            **kw,
        )


class Embeddings(nn.Module):
    cfg: EncoderConfig

    def setup(self):
        cfg = self.cfg
        self.word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype)
        self.position = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=cfg.dtype)
        if cfg.type_vocab_size > 0:
            self.token_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype)
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype)
        self.dropout = nn.Dropout(cfg.hidden_dropout)

    def __call__(self, input_ids, token_type_ids=None, deterministic=True,
                 position_ids=None):
        cfg = self.cfg
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[-1])[None, :]
        x = self.word(input_ids) + self.position(position_ids)
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + self.token_type(token_type_ids)
        x = self.layer_norm(x)
        return self.dropout(x, deterministic=deterministic)


class SelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, deterministic=True):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (cfg.num_heads, head_dim), dtype=cfg.dtype, name=name
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, cfg.dtype)
        )
        scores = scores + mask_bias  # (B, 1, 1, L) additive
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return nn.DenseGeneral(
            cfg.hidden_size, axis=(-2, -1), dtype=cfg.dtype, name="out"
        )(ctx)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, deterministic=True):
        cfg = self.cfg
        attn = SelfAttention(cfg, name="attention")(x, mask_bias, deterministic)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="attn_layer_norm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="ffn_in")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ffn_out")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="ffn_layer_norm")(x + h)


class TransformerEncoder(nn.Module):
    """Post-LN transformer encoder (BERT/DistilBERT family)."""

    cfg: EncoderConfig

    def setup(self):
        cfg = self.cfg
        self.embeddings = Embeddings(cfg)
        layer_cls = EncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        self.layers = [
            layer_cls(cfg) for i in range(cfg.num_layers)
        ]

    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True, position_ids=None, segment_ids=None):
        cfg = self.cfg
        x = self.embeddings(input_ids, token_type_ids, deterministic,
                            position_ids=position_ids)
        if segment_ids is not None:
            # packed rows: block-diagonal attention — token q attends to k
            # iff both belong to the same (nonzero) segment.  Pad rows
            # (segment 0) see only -1e9 scores; max-subtracted softmax turns
            # those into uniform junk that downstream masks drop.
            allowed = (
                segment_ids[:, :, None] == segment_ids[:, None, :]
            ) & (segment_ids[:, None, :] > 0)
            bias = jnp.where(
                allowed[:, None, :, :], 0.0, -1e9
            ).astype(cfg.dtype)
        else:
            # additive attention bias: 0 where attended, -1e9 where masked
            bias = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, -1e9
            ).astype(cfg.dtype)
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        return x

    @property
    def word_embedding_table(self):
        return self.embeddings.word.embedding


class MLMHead(nn.Module):
    """Masked-LM head: transform -> gelu -> LayerNorm -> vocab projection.

    The vocab projection weight may be tied to the word-embedding table by
    passing ``shared_embedding``; a per-vocab bias is always learned.
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, shared_embedding=None):
        cfg = self.cfg
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="transform")(hidden)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(h)
        if shared_embedding is not None:
            logits = jnp.einsum(
                "bld,vd->blv", h, shared_embedding.astype(cfg.dtype)
            )
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                              name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                          jnp.float32)
        return logits + bias.astype(cfg.dtype)


class EncoderWithMLM(nn.Module):
    """Encoder + MLM head returning (hidden_states, logits).

    ``tie_word_embeddings`` reuses the word-embedding table as the output
    projection (HF DistilBERT/BERT default).
    """

    cfg: EncoderConfig
    tie_word_embeddings: bool = True

    def setup(self):
        self.encoder = TransformerEncoder(self.cfg)
        self.mlm = MLMHead(self.cfg)

    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True, position_ids=None, segment_ids=None):
        hidden = self.encoder(
            input_ids, attention_mask, token_type_ids, deterministic,
            position_ids=position_ids, segment_ids=segment_ids,
        )
        shared = (
            self.encoder.word_embedding_table if self.tie_word_embeddings else None
        )
        logits = self.mlm(hidden, shared)
        return hidden, logits
