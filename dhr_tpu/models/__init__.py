"""Flax retriever model family and HF checkpoint interop."""

from dhr_tpu.models.heads import Projector, TermWeightTrans
from dhr_tpu.models.retrievers import (
    MODEL_TYPES,
    BiEncoder,
    Reps,
    RetrieverConfig,
    RetrieverEncoder,
)
from dhr_tpu.models.transformer import (
    EncoderConfig,
    EncoderWithMLM,
    MLMHead,
    TransformerEncoder,
)

__all__ = [
    "MODEL_TYPES",
    "BiEncoder",
    "EncoderConfig",
    "EncoderWithMLM",
    "MLMHead",
    "Projector",
    "Reps",
    "RetrieverConfig",
    "RetrieverEncoder",
    "TermWeightTrans",
    "TransformerEncoder",
]
