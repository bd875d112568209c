"""Utilities: format converters, profiling, logging."""

from dhr_tpu.utils.convert import (
    convert_ranking_to_trec,
    read_qrel_tsv,
    read_tsv_pairs,
)
from dhr_tpu.utils.profiling import phase, report, reset, trace

__all__ = [
    "convert_ranking_to_trec",
    "phase",
    "read_qrel_tsv",
    "read_tsv_pairs",
    "report",
    "reset",
    "trace",
]
