"""Pallas TPU kernel for the exact-GIP candidate rerank.

STATUS: measured-REJECTED for the production path (v5e, 64 q x 10k
candidates: 91.8 ms at U=8 vs 19.9 ms for the XLA gather rerank) — the
per-candidate ~1.7 kB row DMAs are descriptor-issue/latency-bound, so
multi-stream scalar-prefetch gathering loses to XLA's vectorized gather
at this granularity (design.md "Rerank composition", round-3 note).  Kept
in-tree, correct and tested, as the measured answer to VERDICT r2 #4;
the searcher does not use it.

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

Mosaic requires block last-two dims of (8k, 128m) or the full array dims,
so a single row cannot be a ``(1, D)`` block of an ``(N, D)`` array; the
planes are viewed ``(N, D/LANE, LANE)`` and one row is the full-plane
block ``(1, D/LANE, LANE)``.  Requires ``D % LANE == 0`` and
``lex_dim % LANE == 0`` (the searcher falls back to the XLA gather path
otherwise), and ``K`` padded to a LANE multiple (padded scores dropped by
the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _make_kernel(unroll: int, lex_rows: int):
    def _kernel(rows_ref, qv_ref, qi_ref, *refs):
        vrows = refs[:unroll]
        irows = refs[unroll:2 * unroll]
        out_ref = refs[2 * unroll]  # (1, K/LANE, LANE), resident per query
        b = pl.program_id(0)
        t = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when(jnp.logical_and(t == 0, i == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        qv = qv_ref[b]                        # (D/LANE, LANE) f32
        qi = qi_ref[b]                        # (lex_rows, LANE) i32
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        acc = jnp.zeros((1, LANE), jnp.float32)
        for j in range(unroll):
            v = vrows[j][0].astype(jnp.float32)            # (D/LANE, LANE)
            gate = irows[j][0].astype(jnp.int32) == qi     # (lex_rows, LANE)
            lex = jnp.sum(
                jnp.where(gate, v[:lex_rows] * qv[:lex_rows], 0.0)
            )
            cls = jnp.sum(v[lex_rows:] * qv[lex_rows:])
            total = lex + cls
            acc += jnp.where(lane == i * unroll + j, total, 0.0)
        out_ref[0, pl.ds(t, 1), :] += acc

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
    N, D = values.shape
    lex = indices.shape[1]
    assert K % LANE == 0, K
    assert LANE % unroll == 0, unroll
    assert D % LANE == 0 and lex % LANE == 0 and lex_dim == lex, (
        D, lex, lex_dim)
    dr, lr = D // LANE, lex // LANE

    v3 = values.reshape(N, dr, LANE)
    i3 = indices.reshape(N, lr, LANE)
    qv3 = qv.astype(jnp.float32).reshape(B, dr, LANE)
    qi3 = qi.astype(jnp.int32)[:, :lex].reshape(B, lr, LANE)

    def vspec(j):
        return pl.BlockSpec(
            (1, dr, LANE),
            lambda b, t, i, rows, j=j: (
                rows[b, t * LANE + i * unroll + j], 0, 0),
        )

    def ispec(j):
        return pl.BlockSpec(
            (1, lr, LANE),
            lambda b, t, i, rows, j=j: (
                rows[b, t * LANE + i * unroll + j], 0, 0),
        )

    # the candidate-id array rides in SMEM (scalar prefetch, ~1 MB budget);
    # chunk queries so bc * K * 4 B stays well under it
    bc = B
    while bc > 1 and bc * K * 4 > 600_000:
        bc //= 2

    def run_chunk(rows_c, qv_c, qi_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bc, K // LANE, LANE // unroll),
            in_specs=(
                [pl.BlockSpec((bc, dr, LANE),
                              lambda b, t, i, rows: (0, 0, 0))]
                + [pl.BlockSpec((bc, lr, LANE),
                                lambda b, t, i, rows: (0, 0, 0))]
                + [vspec(j) for j in range(unroll)]
                + [ispec(j) for j in range(unroll)]
            ),
            out_specs=pl.BlockSpec(
                (1, K // LANE, LANE), lambda b, t, i, rows: (b, 0, 0)
            ),
        )
        return pl.pallas_call(
            _make_kernel(unroll, lr),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bc, K // LANE, LANE),
                                           jnp.float32),
            interpret=interpret,
        )(
            rows_c.astype(jnp.int32), qv_c, qi_c,
            *([v3] * unroll + [i3] * unroll),
        )

    pad_b = (-B) % bc
    if pad_b:
        rows = jnp.pad(rows, ((0, pad_b), (0, 0)))
        qv3 = jnp.pad(qv3, ((0, pad_b), (0, 0), (0, 0)))
        qi3 = jnp.pad(qi3, ((0, pad_b), (0, 0), (0, 0)))
    outs = [
        run_chunk(rows[c:c + bc], qv3[c:c + bc], qi3[c:c + bc])
        for c in range(0, B + pad_b, bc)
    ]
    out = jnp.concatenate(outs, axis=0)[:B]
    return out.reshape(B, K)
