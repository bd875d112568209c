"""Gated Inner Product (GIP) scoring over densified representations.

For a query ``(qv, qi)`` and a passage ``(pv, pi)``, each of lexical dim
``d_lex`` optionally followed by a ``d_cls`` semantic tail:

    score = sum_j [qi_j == pi_j] * qv_j * pv_j   (+ always-on CLS tail)

The CLS tail participates unconditionally: index planes are padded with the
constant 1 on both sides so the gate always agrees there (semantics parity:
reference ``retrieval/gip_retrieval.py:110-113``).  A query-side CLS weight
``lam`` is applied once at load time (gip_retrieval.py:281-283).

Three computation layouts are provided, all numerically identical:

- :func:`gip_scores_masked` — direct eq-mask broadcast; VPU-bound, best for
  training-sized passage pools (the listwise loss twin,
  reference DHR/modeling.py:272-285).
- :func:`gip_scores_subindex` — decomposes the gate over the fold sub-index
  ``s``: ``score = sum_s (qv . [qi==s]) @ (pv . [pi==s])^T``, turning GIP into
  ``k`` MXU matmuls.  Preferred when both sides are large enough to tile onto
  the 128x128 systolic array.
- :func:`gip_scores_pairwise` — row-wise scores for rerank candidates.

The serving path (corpus-scale, theta-thresholded approximate GIP with fused
top-k) lives in ``dhr_tpu.ops.pallas_gip`` and ``dhr_tpu.retrieval.searcher``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_indices_for_cls(indices: jax.Array, cls_dim: int) -> jax.Array:
    """Pad an index plane with constant 1 over the CLS tail dims."""
    if cls_dim <= 0:
        return indices
    pad = [(0, 0)] * (indices.ndim - 1) + [(0, cls_dim)]
    return jnp.pad(indices, pad, constant_values=1)


def scale_cls_tail(values: jax.Array, lex_dim: int, lam: float) -> jax.Array:
    """Scale the CLS tail of a value plane by ``lam`` (query side, once)."""
    if values.shape[-1] == lex_dim or lam == 1.0:
        return values
    lex, cls = values[..., :lex_dim], values[..., lex_dim:]
    return jnp.concatenate([lex, cls * jnp.asarray(lam, values.dtype)], axis=-1)


def gip_scores_masked(
    qv: jax.Array,
    qi: jax.Array,
    pv: jax.Array,
    pi: jax.Array,
    q_chunk: int = 32,
) -> jax.Array:
    """Exact GIP scores ``(B, N)`` via eq-mask broadcast, chunked over queries.

    Memory is bounded at ``q_chunk * N * d`` mask elements per step; suitable
    for in-batch training pools and rerank verification, not corpus scans.
    """
    B = qv.shape[0]
    if B <= q_chunk:
        gate = qi[:, None, :] == pi[None, :, :]
        prod = qv[:, None, :].astype(jnp.float32) * pv[None, :, :].astype(jnp.float32)
        return jnp.sum(jnp.where(gate, prod, 0.0), axis=-1)
    pad = (-B) % q_chunk
    qv_p = jnp.pad(qv, ((0, pad), (0, 0)))
    qi_p = jnp.pad(qi, ((0, pad), (0, 0)))
    n_chunks = qv_p.shape[0] // q_chunk
    qv_c = qv_p.reshape(n_chunks, q_chunk, -1)
    qi_c = qi_p.reshape(n_chunks, q_chunk, -1)

    def one(args):
        cv, ci = args
        gate = ci[:, None, :] == pi[None, :, :]
        prod = cv[:, None, :].astype(jnp.float32) * pv[None, :, :].astype(jnp.float32)
        return jnp.sum(jnp.where(gate, prod, 0.0), axis=-1)

    out = jax.lax.map(one, (qv_c, qi_c))
    return out.reshape(n_chunks * q_chunk, -1)[:B]


def gip_scores_subindex(
    qv: jax.Array,
    qi: jax.Array,
    pv: jax.Array,
    pi: jax.Array,
    num_folds: int,
) -> jax.Array:
    """Exact GIP scores ``(B, N)`` as ``num_folds`` MXU matmuls.

    ``score[b,n] = sum_s (qv*[qi==s])[b] . (pv*[pi==s])[n]`` — the gate is
    decomposed over the fold sub-index, so each term is a plain inner product
    that XLA tiles onto the MXU.  ``num_folds`` must cover every index value
    present (39 for wordpiece 768-dim DLR).  CLS tails padded with index 1 are
    handled naturally since 1 < num_folds.
    """
    qv32 = qv.astype(jnp.float32)
    pv32 = pv.astype(jnp.float32)

    def body(s, acc):
        qm = jnp.where(qi == s, qv32, 0.0)
        pm = jnp.where(pi == s, pv32, 0.0)
        return acc + jnp.dot(
            qm, pm.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    init = jnp.zeros((qv.shape[0], pv.shape[0]), jnp.float32)
    return jax.lax.fori_loop(0, num_folds, body, init)


def gip_scores_pairwise(
    qv: jax.Array, qi: jax.Array, pv: jax.Array, pi: jax.Array
) -> jax.Array:
    """Row-aligned GIP scores ``(B,)`` (rerank / eval path)."""
    gate = qi == pi
    prod = qv.astype(jnp.float32) * pv.astype(jnp.float32)
    return jnp.sum(jnp.where(gate, prod, 0.0), axis=-1)


def ip_scores(qv: jax.Array, pv: jax.Array) -> jax.Array:
    """Plain inner-product scores ``(B, N)`` (dense / IP-approximation mode).

    Accumulates in f32 at full operand precision: bf16 index planes are
    unaffected (bf16 is already the MXU input width) and f32 parity paths
    become exact instead of silently rounding operands to bf16.
    """
    return jnp.dot(
        qv.astype(jnp.float32), pv.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def threshold_query_values(
    qv: jax.Array, theta: float, lex_dim: int, keep_cls: bool = False
) -> jax.Array:
    """Zero query dims with value <= theta (approximate-GIP gate).

    Equivalent to the reference's important-dims gather
    (gip_retrieval.py:130-136): partial GIP over the dims where ``qv > theta``
    equals full GIP with sub-threshold dims zeroed.  The reference thresholds
    uniformly across lexical and (lambda-scaled) CLS dims; set
    ``keep_cls=True`` to exempt the CLS tail (dims >= ``lex_dim``) instead.
    """
    keep = qv > jnp.asarray(theta, qv.dtype)
    if keep_cls and qv.shape[-1] > lex_dim:
        dim_ids = jnp.arange(qv.shape[-1])
        keep = keep | (dim_ids >= lex_dim)
    return jnp.where(keep, qv, jnp.zeros_like(qv))
