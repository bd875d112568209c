"""Sharded index + search engine, TREC I/O."""

from dhr_tpu.retrieval.trec import merge_runs, read_qrels, read_run, write_run

__all__ = ["merge_runs", "read_qrels", "read_run", "write_run"]
