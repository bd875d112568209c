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
    # dhr/dlr packed head order: False = per-token densify then segment-max
    # (two small (B, L, out_dim) planes reduced S times); True = segment-max
    # over the (B, L, V) weighted plane first, then ONE densify of the
    # (B, S, V) result.  Values are identical either way (max over
    # (token, fold) pairs commutes); fold indices differ only on exact
    # cross-token float ties.  Measured on v5e (packed dhr train step,
    # 24 q x 8 psg distilbert, pack_rows=116): per-token 114.8 ms vs
    # segment-first 146.1 ms — the S masked reduces over the (B, L, V)
    # plane cost more than they save in densify width, so per-token stays
    # the default (docs/design.md "Packed head order").
    packed_segfirst: bool = False

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

    # ---- packed encode (multiple documents per row) ------------------------
    def encode_packed(
        self,
        input_ids,
        segment_ids,
        position_ids,
        seg_start,
        out_dim: int = 768,
        remove_dims: int = 570,
        deterministic: bool = True,
    ):
        """Encode rows that PACK several documents each (token-level packing).

        Inputs are the packed layout produced by
        :func:`dhr_tpu.encode.packed_encode_batches`: ``segment_ids`` (B, L)
        labels each token with its document slot in ``1..S`` (0 = pad),
        ``position_ids`` restart at 0 per segment, and ``seg_start`` (B, S)
        holds each slot's first token position.  Attention is block-diagonal
        over segments, so every document sees exactly the context it would
        see in its own padded row — the packing trick standard in TPU LLM
        pipelines, applied to the encode path the reference pads one
        document per row (reference driver/encode.py via p_max_len).

        Returns per-slot arrays with leading shape ``(B, S)``:

        - dense: ``(pooled, None, None)``
        - dhr/dlr: ``(values, fold_indices, semantic)`` — the
          densified lexical rep computed TWO-LEVEL: per-token densify (fold
          max over vocab), then a per-segment max over tokens.  Values are
          exactly the plain path's (max commutes with fold-max); the fold
          index deviates from the plain path only on exact float ties
          between different folds across tokens (plain resolves fold-first,
          packed token-first) and both emit fold 0 for all-zero slices.
          Out-of-segment positions contribute exact zeros to the segment
          max, reproducing the plain path's zero floor from masked pad
          positions (reference DHR/modeling.py:330-345 masks pads to 0
          before the max) for every document shorter than the row.

        - agg (MLM variants): ``(lexical, None, semantic_or_None)`` — the
          fold commutes with the token max, so each token's vocab plane
          folds first (``aggregate(..., full=False)`` at the full-mode
          width) and the folded planes segment-max.  Sign competition (full
          mode) runs after the segment max, exactly where the plain path
          runs it after its token max (reference
          tevatron/Aggretriever/utils.py:8-44).  skip-MLM raises: the plain
          path scatters pad-position term weights into vocab bucket 0
          (no attention mask in the reference scatter) and those pad hidden
          states do not exist in a packed row.

        colbert raises here (it emits token reps, not per-slot planes);
        its packed path is :meth:`encode_tokens_packed`.
        """
        cfg = self.cfg
        if cfg.model_type not in ("dense", "dhr", "dlr", "agg"):
            raise ValueError(
                f"packed encode supports dense/dhr/dlr/agg, not {cfg.model_type}"
            )
        if cfg.model_type == "agg" and cfg.skip_mlm:
            # plain skip-MLM scatter-maxes term weights at ALL positions
            # 1..L-1 including pads (reference Aggretriever/modeling.py:282-284
            # applies no attention mask), so vocab bucket 0 carries pad-
            # position term weights computed from pad hidden states — states
            # that do not exist in a packed row.  Exact parity is therefore
            # impossible under packing; reject instead of silently deviating.
            raise ValueError(
                "packed encode does not support agg skip_mlm (the plain "
                "path's pad-position scatter into vocab bucket 0 cannot be "
                "reproduced without the pad rows) — use --length-bucketing"
            )
        attn = (segment_ids > 0).astype(jnp.int32)
        if cfg.needs_mlm:
            hidden, logits = self.backbone(
                input_ids, attn, deterministic=deterministic,
                position_ids=position_ids, segment_ids=segment_ids,
            )
        else:
            hidden = self.backbone(
                input_ids, attn, deterministic=deterministic,
                position_ids=position_ids, segment_ids=segment_ids,
            )
            logits = None
        S = seg_start.shape[1]

        if cfg.model_type == "dense":
            if cfg.pooling == "mean":
                seg_range = jnp.arange(1, S + 1)
                onehot = (
                    segment_ids[:, None, :] == seg_range[None, :, None]
                ).astype(hidden.dtype)  # (B, S, L)
                pooled = jnp.einsum("bsl,blh->bsh", onehot, hidden)
                pooled = pooled / jnp.maximum(
                    jnp.sum(onehot, axis=-1)[..., None], 1.0
                )
            else:
                pooled = jnp.take_along_axis(
                    hidden, seg_start[:, :, None], axis=1
                )
            if self._use_pooler:
                pooled = self.pooler(pooled)
            return pooled.astype(jnp.float32), None, None

        if cfg.model_type == "agg":
            return self._agg_packed(
                hidden, logits, input_ids, segment_ids, position_ids,
                seg_start,
            )

        # dhr / dlr: per-token softmax x term-weight, densified per token,
        # then segment-max over tokens.  The (B, L, V) weighted plane fuses
        # into the vocab matmul's consumer; only (B, L, out_dim) val/idx
        # planes materialize (the barrier keeps XLA from re-running the
        # vocab matmul once per segment reduce).
        from dhr_tpu.ops.densify import densify

        tw = self.term_weight(hidden)  # (B, L, 1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        token_ok = (
            (segment_ids > 0) & (position_ids > 0)
        )[..., None]  # exclude pads and each segment's own [CLS] row
        weighted = probs * tw.astype(jnp.float32) * token_ok.astype(jnp.float32)

        if cfg.packed_segfirst:
            # segment-FIRST order: reduce the (B, L, V) weighted plane to
            # (B, S, V) per-segment maxima, then densify once.  The barrier
            # keeps XLA from re-RUNNING the vocab matmul per segment reduce,
            # but each of the S masked reduces still re-READS the
            # materialized (B, L, V) plane — which is why this order
            # measured slower e2e (docs/design.md "Packed head order").
            weighted = jax.lax.optimization_barrier(weighted)
            seg_planes = []
            for s in range(S):
                m = (
                    (segment_ids == (s + 1)) & (position_ids > 0)
                )[..., None]
                seg_planes.append(
                    jnp.max(jnp.where(m, weighted, 0.0), axis=1)
                )
            seg_plane = jnp.stack(seg_planes, axis=1)  # (B, S, V)
            vals, idxs = densify(seg_plane, out_dim, remove_dims)
        else:
            tok_vals, tok_idx = densify(weighted, out_dim, remove_dims)
            tok_vals, tok_idx = jax.lax.optimization_barrier(
                (tok_vals, tok_idx)
            )

            vals_list, idx_list = [], []
            for s in range(S):
                m = (
                    (segment_ids == (s + 1)) & (position_ids > 0)
                )[..., None]  # (B, L, 1)
                mv = jnp.where(m, tok_vals, 0.0)
                win_val = jnp.max(mv, axis=1)  # (B, out_dim)
                # winner's fold index via compare+max, NOT argmax +
                # take_along_axis: the 1-of-L gather along the sublane axis
                # is the slow op on TPU (measured: it alone ate the packed
                # transformer saving; this form is pure elementwise +
                # reduce).  On exact value ties across tokens this keeps the
                # LARGEST fold index of the tied tokens — tie-only
                # deviation, same class as the documented packed-vs-plain
                # tie semantics.
                mi = jnp.where(
                    m & (tok_vals == win_val[:, None, :]), tok_idx, 0
                )
                vals_list.append(win_val)
                idx_list.append(jnp.max(mi, axis=1))
            vals = jnp.stack(vals_list, axis=1)  # (B, S, out_dim)
            idxs = jnp.stack(idx_list, axis=1)

        cls_h = jnp.take_along_axis(hidden, seg_start[:, :, None], axis=1)
        semantic = self.pooler(cls_h) if self._use_pooler else cls_h
        return vals, idxs, semantic.astype(jnp.float32)

    def encode_tokens_packed(
        self, input_ids, segment_ids, position_ids, deterministic: bool = True
    ):
        """ColBERT packed token reps: ``(B, L, Dp)``, pad positions zeroed.

        The packed-row twin of :meth:`_colbert_reps` for the passage side
        (queries are near-uniform short and use the plain path; their x32
        length normalization also needs per-row lengths).  The head is
        purely per-token (projection + pad zeroing, reference
        ColBERT/modeling.py:221-252), so packing only changes the
        transformer call: block-diagonal attention + per-segment positions,
        exactly :meth:`encode_packed`'s backbone invocation.  Each segment
        is laid out ``[CLS], t1, ...`` within its row, so the host unpacks
        per-document reps with one contiguous slice per segment — the
        (N, L, D) layout :func:`dhr_tpu.retrieval.colbert` scores.
        """
        cfg = self.cfg
        if cfg.model_type != "colbert":
            raise ValueError(
                f"encode_tokens_packed is colbert-only, not {cfg.model_type}"
            )
        attn = (segment_ids > 0).astype(jnp.int32)
        hidden = self.backbone(
            input_ids, attn, deterministic=deterministic,
            position_ids=position_ids, segment_ids=segment_ids,
        )
        reps = self.pooler(hidden)
        reps = reps * (segment_ids > 0)[..., None].astype(reps.dtype)
        return reps.astype(jnp.float32)

    def _agg_packed(self, hidden, logits, input_ids, segment_ids,
                    position_ids, seg_start):
        """Aggretriever packed encode: per-segment fold-max + sign competition.

        Fold-max over the vocab commutes with the max over a segment's
        tokens, so the MLM variant never materializes a per-segment (B, S, V)
        plane: each token's weighted vocab distribution folds to the
        aggregation width first (fusing into the vocab matmul's consumer,
        like the plain path), then a masked max over the segment's tokens
        reduces (B, L, width) -> (B, S, width).  Sign competition (full
        mode) runs after that reduce — the same point in the chain as the
        plain path (reference tevatron/Aggretriever/utils.py:8-44, applied
        after the token max of modeling.py:268-284).  skip-MLM is rejected
        upstream (see encode_packed).  Zero-floor semantics match the packed
        dhr path:
        out-of-segment positions contribute exact zeros, reproducing the
        plain path's masked-pad floor for every document shorter than its
        row.
        """
        from dhr_tpu.ops.aggregate import aggregate

        cfg = self.cfg
        S = seg_start.shape[1]
        width = cfg.agg_dim if cfg.semi_aggregate else 2 * cfg.agg_dim
        token_ok = (segment_ids > 0) & (position_ids > 0)  # (B, L)
        tw = self.term_weight(hidden)  # (B, L, 1)

        if cfg.needs_mlm:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            weighted = (
                probs * tw.astype(jnp.float32)
                * token_ok[..., None].astype(jnp.float32)
            )
            tok_folded = aggregate(weighted, width, full=False)  # (B, L, W)
            tok_folded = jax.lax.optimization_barrier(tok_folded)
            vals_list = []
            for s in range(S):
                m = (segment_ids == (s + 1))[..., None]
                vals_list.append(
                    jnp.max(jnp.where(m & token_ok[..., None], tok_folded, 0.0),
                            axis=1)
                )
            tok = jnp.stack(vals_list, axis=1)  # (B, S, W)
        else:
            # unreachable: skip-MLM is rejected in encode_packed (see there)
            raise ValueError("packed encode does not support agg skip_mlm")

        if not cfg.semi_aggregate:
            pos_l, neg_l = tok[..., 0::2], tok[..., 1::2]
            tok = jnp.where(pos_l > neg_l, pos_l, -neg_l)

        semantic = None
        if self._use_pooler:
            cls_h = jnp.take_along_axis(hidden, seg_start[:, :, None], axis=1)
            semantic = self.pooler(cls_h).astype(jnp.float32)
        return tok, None, semantic

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

    def encode_passages_packed(
        self, input_ids, segment_ids, position_ids, seg_start,
        out_dim: int = 768, remove_dims: int = 570, deterministic: bool = True,
    ):
        """Packed-row passage encode (see RetrieverEncoder.encode_packed)."""
        return self.encoder_p.encode_packed(
            input_ids, segment_ids, position_ids, seg_start,
            out_dim=out_dim, remove_dims=remove_dims,
            deterministic=deterministic,
        )

    def encode_tokens_packed(
        self, input_ids, segment_ids, position_ids, deterministic: bool = True
    ):
        """Packed-row colbert passage token reps (see RetrieverEncoder)."""
        return self.encoder_p.encode_tokens_packed(
            input_ids, segment_ids, position_ids, deterministic=deterministic
        )
