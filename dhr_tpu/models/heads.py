"""Projection heads shared across the retriever family.

- :class:`Projector` — linear pooler applied to [CLS] hidden states (the
  reference's ``LinearPooler``, DHR/modeling.py:36-76) or to token reps
  (ColBERT projection).
- :class:`TermWeightTrans` — per-position scalar term-weight head used by the
  DHR and Aggretriever lexical encoders (DHR/modeling.py:359-368).

Both are plain linear maps; query/passage tying is handled one level up by
the bi-encoder (tied encoders share the whole module).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Projector(nn.Module):
    out_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(x)


class TermWeightTrans(nn.Module):
    """Hidden-state -> scalar term weight, one per sequence position."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, dtype=self.dtype, name="linear")(x)
