"""Sharded index + search engine, TREC I/O."""

from dhr_tpu.retrieval.index import DeviceIndex, PackedIndex
from dhr_tpu.retrieval.searcher import SearchConfig, Searcher, calibrate_pool
from dhr_tpu.retrieval.trec import merge_runs, read_qrels, read_run, write_run

__all__ = [
    "DeviceIndex",
    "PackedIndex",
    "SearchConfig",
    "Searcher",
    "calibrate_pool",
    "merge_runs",
    "read_qrels",
    "read_run",
    "write_run",
]
