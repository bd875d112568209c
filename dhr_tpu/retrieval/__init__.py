"""Sharded index + search engine, TREC I/O."""

from dhr_tpu.retrieval.index import DeviceIndex, PackedIndex
from dhr_tpu.retrieval.searcher import SearchConfig, Searcher
from dhr_tpu.retrieval.trec import merge_runs, read_qrels, read_run, write_run

__all__ = [
    "DeviceIndex",
    "PackedIndex",
    "SearchConfig",
    "Searcher",
    "merge_runs",
    "read_qrels",
    "read_run",
    "write_run",
]
