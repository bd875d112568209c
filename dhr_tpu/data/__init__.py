"""Data layer: interchange formats, sampling, collation, loading."""

from dhr_tpu.data.collate import collate_encode, collate_train, pad_token_batch
from dhr_tpu.data.examples import (
    Corpus,
    load_sparse_vectors,
    load_tokenized_corpus,
    load_train_groups,
    read_jsonl,
    write_jsonl,
)
from dhr_tpu.data.loader import TrainLoader
from dhr_tpu.data.sampling import (
    SamplingConfig,
    TASBSampler,
    sample_kd_example,
    sample_train_example,
    select_passages,
)

__all__ = [
    "Corpus",
    "SamplingConfig",
    "TASBSampler",
    "TrainLoader",
    "collate_encode",
    "collate_train",
    "load_sparse_vectors",
    "load_tokenized_corpus",
    "load_train_groups",
    "pad_token_batch",
    "read_jsonl",
    "sample_kd_example",
    "sample_train_example",
    "select_passages",
    "write_jsonl",
]
