"""Pallas TPU kernel for the exact-GIP candidate rerank.

The rerank stage gathers each query's ``K`` candidate rows from the
row-major planes and scores them exactly (searcher ``_rerank_gip``,
reference retrieval/gip_retrieval.py:144-148).  XLA's gather runs the
stage at ~48 GB/s effective (design.md "Rerank composition"); this kernel
instead drives the row fetches from **scalar-prefetched candidate ids**
(the ``ops/pallas_gip.py`` trick applied to rows instead of dim planes):

- grid ``(B, K/LANE, LANE/U)``; each step DMAs ``U`` candidate rows of the
  value plane (+ index plane) selected by the BlockSpec ``index_map`` from
  the prefetched ``rows`` array — ``2*U`` HBM->VMEM streams in flight;
- the eq-gate masked product-sum is fused in the same step (VPU), so no
  ``(B, K, D)`` gathered intermediate ever exists in HBM;
- the ``(1, LANE)`` score tile accumulates in VMEM across the inner grid
  steps (one lane per candidate).

``K`` must be a LANE multiple — the searcher pads candidate ids and
drops the padded scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _make_kernel(unroll: int, lex_dim: int):
    def _kernel(rows_ref, qv_ref, qi_ref, *refs):
        vrows = refs[:unroll]
        irows = refs[unroll:2 * unroll]
        out_ref = refs[2 * unroll]
        b = pl.program_id(0)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        qv = qv_ref[pl.ds(b, 1), :]          # (1, D) f32
        qi = qi_ref[pl.ds(b, 1), :]          # (1, lex) i32
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        acc = jnp.zeros((1, LANE), jnp.float32)
        for j in range(unroll):
            v = vrows[j][...].astype(jnp.float32)          # (1, D)
            gate = irows[j][...].astype(jnp.int32) == qi   # (1, lex)
            lex = jnp.sum(jnp.where(gate, v[:, :lex_dim] * qv[:, :lex_dim],
                                    0.0))
            cls = jnp.sum(v[:, lex_dim:] * qv[:, lex_dim:])
            total = lex + cls
            acc += jnp.where(lane == i * unroll + j, total, 0.0)
        out_ref[...] += acc

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("lex_dim", "interpret", "unroll")
)
def pallas_rerank_gip(
    qv: jax.Array,       # (B, D) f32 — full (unthresholded) scaled queries
    qi: jax.Array,       # (B, lex) i32
    rows: jax.Array,     # (B, K) i32 candidate row ids; K % LANE == 0
    values: jax.Array,   # (N, D) row-major value plane (int8/bf16/f16)
    indices: jax.Array,  # (N, lex) row-major index plane (i8/i16)
    lex_dim: int,
    interpret: bool = False,
    unroll: int = 8,
) -> jax.Array:
    """Exact GIP scores (B, K) of each query's candidate rows."""
    B, K = rows.shape
    D = values.shape[1]
    assert K % LANE == 0, K
    assert LANE % unroll == 0, unroll

    def vspec(j):
        return pl.BlockSpec(
            (1, D),
            lambda b, t, i, rows, j=j: (rows[b, t * LANE + i * unroll + j], 0),
        )

    def ispec(j):
        return pl.BlockSpec(
            (1, indices.shape[1]),
            lambda b, t, i, rows, j=j: (rows[b, t * LANE + i * unroll + j], 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K // LANE, LANE // unroll),
        in_specs=(
            [pl.BlockSpec((B, D), lambda b, t, i, rows: (0, 0))]
            + [pl.BlockSpec((B, qi.shape[1]), lambda b, t, i, rows: (0, 0))]
            + [vspec(j) for j in range(unroll)]
            + [ispec(j) for j in range(unroll)]
        ),
        out_specs=pl.BlockSpec((1, LANE), lambda b, t, i, rows: (b, t)),
    )
    out = pl.pallas_call(
        _make_kernel(unroll, lex_dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        interpret=interpret,
    )(
        rows.astype(jnp.int32),
        qv.astype(jnp.float32),
        qi.astype(jnp.int32),
        *([values] * unroll + [indices] * unroll),
    )
    return out
