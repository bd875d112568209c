"""Utilities: format converters, profiling, logging."""

from dhr_tpu.utils.convert import (
    convert_ranking_to_trec,
    read_qrel_tsv,
    read_tsv_pairs,
)

__all__ = ["convert_ranking_to_trec", "read_qrel_tsv", "read_tsv_pairs"]
