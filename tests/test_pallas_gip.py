"""Pallas partial-GIP kernel vs the jnp reference path (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhr_tpu.ops.pallas_gip import partial_gip_scores_pallas
from dhr_tpu.retrieval.searcher import _partial_gip_scores


@pytest.mark.parametrize("unroll", [1, 4, 8])
@pytest.mark.parametrize("lex,cls,k", [(16, 4, 5), (8, 0, 3)])
def test_pallas_kernel_matches_jnp(rng, lex, cls, k, unroll):
    B, N, I = 4, 256, 6
    D = lex + cls
    values_T = jnp.asarray(rng.random((D, N)), jnp.float32)
    indices_T = jnp.asarray(rng.integers(0, k, (lex, N)), jnp.int8)
    qv = jnp.asarray(
        np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0), jnp.float32
    )
    qi = jnp.asarray(
        np.concatenate(
            [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
        ), jnp.int32,
    )
    want = np.asarray(_partial_gip_scores(qv, qi, values_T, indices_T, lex, I))
    got = np.asarray(
        partial_gip_scores_pallas(
            qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True,
            unroll=unroll,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_kernel_brute_force_equals_masked_gip(rng):
    """I == D with theta=0 must equal exact GIP + CLS inner product."""
    from dhr_tpu.ops import gip_scores_masked, pad_indices_for_cls

    B, N, lex, cls, k = 3, 128, 8, 2, 4
    D = lex + cls
    pv = rng.random((N, D)).astype(np.float32)
    pi = rng.integers(0, k, (N, lex)).astype(np.int8)
    qv = rng.random((B, D)).astype(np.float32)
    qi = rng.integers(0, k, (B, lex)).astype(np.int32)
    qi_full = np.asarray(pad_indices_for_cls(jnp.asarray(qi), cls))
    pi_full = np.asarray(pad_indices_for_cls(jnp.asarray(pi.astype(np.int32)), cls))
    want = np.asarray(
        gip_scores_masked(
            jnp.asarray(qv), jnp.asarray(qi_full),
            jnp.asarray(pv), jnp.asarray(pi_full),
        )
    )
    got = np.asarray(
        partial_gip_scores_pallas(
            jnp.asarray(qv), jnp.asarray(qi_full),
            jnp.asarray(pv.T.copy()), jnp.asarray(pi.T.copy()),
            lex, D, n_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_kernel_bf16_out_close_to_f32(rng):
    """candidate_bf16 mode: f32 scratch accumulation, bf16 only on the final
    write — values match the f32 kernel within bf16 rounding."""
    B, N, I, lex, cls, k = 4, 512, 12, 16, 4, 5
    D = lex + cls
    values_T = jnp.asarray(rng.random((D, N)), jnp.float32)
    indices_T = jnp.asarray(rng.integers(0, k, (lex, N)), jnp.int8)
    qv = jnp.asarray(
        np.where(rng.random((B, D)) > 0.5, rng.random((B, D)), 0.0),
        jnp.float32,
    )
    qi = jnp.asarray(
        np.concatenate(
            [rng.integers(0, k, (B, lex)), np.ones((B, cls))], axis=1
        ), jnp.int32,
    )
    f32 = partial_gip_scores_pallas(
        qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True)
    b16 = partial_gip_scores_pallas(
        qv, qi, values_T, indices_T, lex, I, n_tile=128, interpret=True,
        out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b16, np.float32), np.asarray(f32), rtol=8e-3, atol=8e-3)
