"""Pallas candidate-gather rerank kernel vs the jnp path (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhr_tpu.ops.pallas_rerank import pallas_rerank_gip
from dhr_tpu.retrieval.searcher import _rerank_gip


@pytest.mark.parametrize("unroll", [4, 8])
@pytest.mark.parametrize("vdtype", [jnp.float32, jnp.int8])
def test_pallas_rerank_matches_jnp(rng, unroll, vdtype):
    B, K, N, lex, cls = 3, 256, 512, 128, 128
    D = lex + cls
    if vdtype == jnp.int8:
        values = jnp.asarray(
            rng.integers(-127, 128, (N, D)), jnp.int8)
    else:
        values = jnp.asarray(rng.random((N, D)), jnp.float32)
    indices = jnp.asarray(rng.integers(0, 6, (N, lex)), jnp.int8)
    qv = jnp.asarray(rng.random((B, D)), jnp.float32)
    qi = jnp.asarray(rng.integers(0, 6, (B, lex)), jnp.int32)
    rows = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    got = pallas_rerank_gip(qv, qi, rows, values, indices, lex,
                            interpret=True, unroll=unroll)
    cand_v = jnp.take(values, rows, axis=0)
    cand_i = jnp.take(indices, rows, axis=0)
    qi_full = jnp.concatenate([qi, jnp.ones((B, cls), jnp.int32)], axis=1)
    want = _rerank_gip(qv, qi_full, cand_v, cand_i, lex)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_rerank_query_chunking(rng):
    """B*K over the SMEM prefetch budget splits into query chunks."""
    B, K, N, lex, cls = 9, 2560, 256, 128, 128  # bc halves + pad path
    D = lex + cls
    values = jnp.asarray(rng.random((N, D)), jnp.float32)
    indices = jnp.asarray(rng.integers(0, 4, (N, lex)), jnp.int8)
    qv = jnp.asarray(rng.random((B, D)), jnp.float32)
    qi = jnp.asarray(rng.integers(0, 4, (B, lex)), jnp.int32)
    rows = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    got = pallas_rerank_gip(qv, qi, rows, values, indices, lex,
                            interpret=True, unroll=8)
    cand_v = jnp.take(values, rows, axis=0)
    cand_i = jnp.take(indices, rows, axis=0)
    qi_full = jnp.concatenate([qi, jnp.ones((B, cls), jnp.int32)], axis=1)
    want = _rerank_gip(qv, qi_full, cand_v, cand_i, lex)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
