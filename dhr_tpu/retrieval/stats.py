"""Index/query diagnostics.

Covers the reference's scattered analysis prints as proper functions:
- index density (gip_retrieval.py:316-318's commented density probe),
- average important-dim count per query at a theta ("average number of index
  use", gip_retrieval.py:161-163),
- fold-usage histogram over the argmax planes (the role of util.py:257-316's
  vocabulary co-occurrence analyzer: how evenly folds win their slices).
"""

from __future__ import annotations

import numpy as np


def index_stats(packed) -> dict:
    values = np.asarray(packed.values, np.float32)
    out = {
        "rows": int(packed.num_rows),
        "dim": int(packed.dim),
        "lex_dim": int(packed.lex_dim),
        "density": float((values != 0).mean()),
        "value_mean": float(values.mean()),
        "value_absmax": float(np.abs(values).max()),
        "bytes_values": int(packed.values.nbytes),
        "bytes_indices": 0 if packed.indices is None else int(
            packed.indices.nbytes
        ),
    }
    if packed.indices is not None:
        folds, counts = np.unique(np.asarray(packed.indices),
                                  return_counts=True)
        frac = counts / counts.sum()
        out["fold_usage"] = {
            "n_folds_used": int(len(folds)),
            "max_fraction": float(frac.max()),
            "entropy_bits": float(-(frac * np.log2(frac)).sum()),
        }
    return out


def avg_important_dims(query_values: np.ndarray, theta: float,
                       lex_dim: int | None = None) -> float:
    """Mean number of query dims above theta (the theta-pass work per query)."""
    qv = np.asarray(query_values, np.float32)
    if lex_dim is not None:
        qv = qv[:, :lex_dim]
    return float((qv > theta).sum(axis=1).mean())
