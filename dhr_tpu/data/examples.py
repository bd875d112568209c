"""Readers for the pipeline's interchange JSONL formats.

These files ARE the architecture boundary of the reference pipeline
(SURVEY.md section 1): every stage communicates through them, so the formats
are preserved byte-compatibly:

- tokenized corpus/query: ``{"text_id": id, "text": [vocab_ids]}``
  (reference utils/tokenize_corpus.py:31)
- train groups: ``{"query": [...], "positives": [...], "negatives": [...]}``
  or the pid variant ``positive_pids``/``negative_pids`` (+ optional
  ``bin_pairs`` for margin-KD) resolved against a corpus
  (reference data.py:51-222)
- sparse vectors: ``{"id": docid, "vector": {token: weight}}``
  (reference densify/output_vector.py:30)
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterable, Iterator


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            p for p in glob.glob(os.path.join(path, "*"))
            if p.endswith((".json", ".jsonl"))
        )
    matches = sorted(glob.glob(path))
    return matches if matches else [path]


def read_jsonl(path: str) -> Iterator[dict]:
    for p in _expand(path):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)


def load_tokenized_corpus(path: str) -> tuple[list[str], list[list[int]]]:
    """Load ``{"text_id", "text"}`` rows -> (ids, token lists).

    Uses the C++ single-pass parser when built (``dhr_tpu.native``); the
    Python json reader is the fallback and the semantic reference.
    """
    files = _expand(path)
    try:
        from dhr_tpu import native

        if native.available():
            all_ids, all_texts = [], []
            for p in files:
                ids, tokens, offsets = native.load_tokenized_corpus_native(p)
                all_ids.extend(ids)
                all_texts.extend(
                    tokens[offsets[i]: offsets[i + 1]].tolist() or [0]
                    for i in range(len(ids))
                )
            return all_ids, all_texts
    except Exception:  # noqa: BLE001 - any native failure falls back
        pass
    ids, texts = [], []
    for row in read_jsonl(path):
        ids.append(str(row["text_id"]))
        texts.append(row["text"] if row["text"] else [0])
    return ids, texts


def load_train_groups(path: str) -> list[dict]:
    return list(read_jsonl(path))


def load_sparse_vectors(path: str) -> Iterator[tuple[str, dict]]:
    for row in read_jsonl(path):
        yield str(row["id"]), row["vector"]


def write_jsonl(path: str, rows: Iterable[dict]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def load_hf_dataset_groups(
    name: str, split: str = "train", cache_dir: str | None = None,
) -> list[dict]:
    """Optional HF-datasets ingestion (reference datasets/dataset.py role).

    Loads a hub/local dataset whose rows already carry ``query`` +
    ``positives``/``negatives`` (Tevatron self-contained format) and returns
    train groups.  Gated on the ``datasets`` package; offline environments
    use the JSONL readers above instead.
    """
    import datasets as hf_datasets

    ds = hf_datasets.load_dataset(name, split=split, cache_dir=cache_dir)
    return [dict(row) for row in ds]


class Corpus:
    """Random-access pid -> token-id list (reference TrainTASBDataset corpus).

    The reference indexes msmarco pids positionally (data.py:90 note); this
    wrapper supports positional ints and falls back to a docid map.
    """

    def __init__(self, ids: list[str], texts: list[list[int]]):
        self.ids = ids
        self.texts = texts
        self._by_id: dict[str, int] | None = None

    @staticmethod
    def load(path: str) -> "Corpus":
        return Corpus(*load_tokenized_corpus(path))

    def __len__(self) -> int:
        return len(self.ids)

    def text_by_pid(self, pid) -> list[int]:
        try:
            return self.texts[int(pid)]
        except (ValueError, IndexError):
            if self._by_id is None:
                self._by_id = {d: i for i, d in enumerate(self.ids)}
            return self.texts[self._by_id[str(pid)]]
