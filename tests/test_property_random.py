"""Randomized property tests over many shapes/seeds (SURVEY.md section 4:
property tests for collision/tie semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dhr_tpu.ops import (
    aggregate,
    cal_remove_dim,
    densify,
    gip_scores_masked,
    gip_scores_subindex,
    undensify,
)
from oracle import aggregate_oracle, gip_oracle


@pytest.mark.parametrize("seed", range(5))
def test_densify_properties_random_shapes(seed):
    rng = np.random.default_rng(seed)
    out_dim = int(rng.integers(2, 12))
    k = int(rng.integers(1, 6))
    remove = int(rng.integers(0, 7))
    vocab = remove + k * out_dim
    B = int(rng.integers(1, 5))
    x = rng.standard_normal((B, vocab)).astype(np.float32)
    v, i = densify(jnp.asarray(x), out_dim, remove)
    v, i = np.asarray(v), np.asarray(i)
    # property 1: value is the max over the fold column
    folded = x[:, remove:].reshape(B, k, out_dim)
    np.testing.assert_allclose(v, folded.max(axis=1), rtol=1e-6)
    # property 2: index points at a cell attaining the max
    picked = np.take_along_axis(folded, i[:, None, :], axis=1)[:, 0]
    np.testing.assert_allclose(picked, v, rtol=1e-6)
    # property 3: first-max tie break
    np.testing.assert_array_equal(i, folded.argmax(axis=1))
    # property 4: undensify scatters each value back at its winning fold
    back = np.asarray(undensify(jnp.asarray(v), jnp.asarray(i), vocab, remove))
    back_folded = back[:, remove:].reshape(B, k, out_dim)
    scattered = np.take_along_axis(back_folded, i[:, None, :], axis=1)[:, 0]
    np.testing.assert_allclose(scattered, v, rtol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_aggregate_matches_oracle_random(seed):
    rng = np.random.default_rng(100 + seed)
    dim = int(rng.integers(2, 10)) * 2
    vocab = int(rng.integers(dim * 2, dim * 20))
    full = bool(rng.integers(0, 2))
    x = rng.standard_normal((3, vocab)).astype(np.float32)
    got = np.asarray(aggregate(jnp.asarray(x), dim, full=full))
    want = aggregate_oracle(x, dim, full=full)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_gip_layouts_agree_random(seed):
    rng = np.random.default_rng(200 + seed)
    B = int(rng.integers(1, 6))
    N = int(rng.integers(1, 20))
    d = int(rng.integers(1, 24))
    k = int(rng.integers(1, 8))
    qv = rng.standard_normal((B, d)).astype(np.float32)
    pv = rng.standard_normal((N, d)).astype(np.float32)
    qi = rng.integers(0, k, (B, d)).astype(np.int32)
    pi = rng.integers(0, k, (N, d)).astype(np.int32)
    want = gip_oracle(qv, qi, pv, pi)
    a = gip_scores_masked(*map(jnp.asarray, (qv, qi, pv, pi)), q_chunk=2)
    b = gip_scores_subindex(*map(jnp.asarray, (qv, qi, pv, pi)), num_folds=k)
    np.testing.assert_allclose(np.asarray(a), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), want, rtol=1e-4, atol=1e-5)


def test_cal_remove_dim_invariants():
    for dims in range(2, 2000, 37):
        r = cal_remove_dim(dims)
        assert r <= 1000
        assert (30522 - r) % dims == 0
