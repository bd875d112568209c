"""Pallas TPU kernel for the theta-pass partial GIP scores.

Computes, for each query ``b`` and corpus row ``n``::

    scores[b, n] = sum_i  gate(b, i, n) * imp_vals[b, i] * values_T[dim_i, n]
    gate        = (dim_i >= lex_dim) or (indices_T[dim_i, n] == imp_gates[b, i])

i.e. exactly :func:`dhr_tpu.retrieval.searcher._partial_gip_scores`, but as a
hand-scheduled kernel:

- ``imp_dims``/``imp_gates``/``imp_vals`` ride in **scalar prefetch** (SMEM),
  so each grid step's BlockSpec ``index_map`` selects the *data-dependent*
  dim-row tile of the corpus planes — Pallas's pipeline machinery then
  double-buffers the HBM->VMEM DMAs of exactly the rows each query needs.
  XLA's gather can't pipeline this access pattern.
- the dim-major planes are viewed as ``(D, N/128, 128)`` so each dim's
  N-vector is a standalone 2D-tiled plane: a block ``(1, n_tile/128, 128)``
  is a fully-packed contiguous DMA (a ``(1, n_tile)`` row of a ``(D, N)``
  array would straddle sublane tiles at 1/16 packing).
- grid is ``(B, N_tiles, I)`` with the reduction axis innermost: the output
  tile ``(b, n)`` stays resident in VMEM across all ``I`` accumulation steps.

The kernel reads ``I * N * (2 + 1)`` bytes per query — the bandwidth
speed-of-light for theta-approximate GIP at ``I`` important dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Scalar-prefetch operands live in SMEM (~1 MB total on v5e, shared with
# grid bookkeeping).  The three (B, I) prefetch arrays cost B * I * 12
# bytes; past this budget AOT allocation fails ("Allocation type: scoped"),
# observed at B=128, I=896 (brute-force theta=0 over a 896-dim index).
# Both kernel wrappers chunk the query axis so each pallas_call stays under.
_SMEM_PREFETCH_BUDGET = 512 * 1024


def _query_chunk(B: int, n_imp: int) -> int:
    """Largest query-chunk size whose prefetch fits the SMEM budget.

    Prefers an equal divisor of ``B`` so every chunk shares one compiled
    kernel shape; falls back to 1 (always fits: I <= vocab dims << budget).
    """
    per_q = n_imp * 12  # dims i32 + gates i32 + vals f32
    if B * per_q <= _SMEM_PREFETCH_BUDGET:
        return B
    chunk = max(1, _SMEM_PREFETCH_BUDGET // per_q)
    while B % chunk:
        chunk -= 1
    return chunk


def _make_kernel(unroll: int, narrow_out: bool):
    """Kernel processing ``unroll`` important dims per grid step.

    Unrolling amortizes the per-grid-step fixed cost and, more importantly,
    puts ``2 * unroll`` HBM->VMEM DMA streams in flight per step: measured
    on v5e, one stream sustains only ~31 GB/s at 100-200 KB tiles, so
    aggregate bandwidth scales with stream count (U=1: 46.7 ms, U=8:
    40.6 ms bf16 / 31.9 ms int8 for B=64, I=48, N=1.64M).

    ``narrow_out``: accumulate in an f32 VMEM scratch and cast to the
    (narrower) output dtype on the last reduction step — halves the (B, N)
    score write + the candidate top-k's read when the caller only needs
    candidate ordering (exact rerank follows).
    """

    def _kernel(dims_ref, gates_ref, vals_ref, lex_ref,  # scalar prefetch
                *refs):  # unroll vrow refs, unroll irow refs, out_ref[, acc]
        vrows = refs[:unroll]
        irows = refs[unroll:2 * unroll]
        out_ref = refs[2 * unroll]
        acc_ref = refs[2 * unroll + 1] if narrow_out else out_ref
        b = pl.program_id(0)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lex_dim = lex_ref[0]
        acc = jnp.zeros_like(acc_ref[0])
        for j in range(unroll):
            dim = dims_ref[b, i * unroll + j]
            gate_val = gates_ref[b, i * unroll + j]
            v = vals_ref[b, i * unroll + j]
            row = vrows[j][0].astype(jnp.float32)        # (TS, 128)
            # CLS dims (dim >= lex_dim) are always gated open; expressed as
            # a logical-or with a scalar (Mosaic cannot select between bool
            # vectors, and cannot compare i8 vectors — widen to i32).
            gate = jnp.logical_or(
                irows[j][0].astype(jnp.int32) == gate_val, dim >= lex_dim
            )
            acc += jnp.where(gate, row * v, 0.0)
        acc_ref[0] += acc
        if narrow_out:
            @pl.when(i == pl.num_programs(2) - 1)
            def _():
                out_ref[0] = acc_ref[0].astype(out_ref.dtype)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("n_tile", "interpret", "unroll", "out_dtype")
)
def pallas_partial_gip(
    imp_vals: jax.Array,     # (B, I) f32 — thresholded important values
    imp_dims: jax.Array,     # (B, I) i32 — dim ids
    imp_gates: jax.Array,    # (B, I) i32 — expected argmax index per dim
    values_T: jax.Array,     # (D, N) bf16/i8 dim-major value plane
    indices_T: jax.Array,    # (lex_dim, N) i8/i16 dim-major index plane
    lex_dim: int | jax.Array,
    n_tile: int = 4096,
    interpret: bool = False,
    unroll: int = 8,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Partial GIP scores (B, N) via the scalar-prefetch streaming kernel.

    ``unroll`` dims are streamed per grid step (see :func:`_make_kernel`);
    the important-dim axis is zero-padded up to a multiple of ``unroll``
    (zero ``imp_vals`` contribute nothing regardless of gate).
    """
    B, n_imp = imp_vals.shape
    D, N = values_T.shape
    assert N % n_tile == 0 and n_tile % LANE == 0, (N, n_tile)
    unroll = max(1, min(unroll, n_imp))
    pad = (-n_imp) % unroll
    if pad:
        imp_vals = jnp.pad(imp_vals, ((0, 0), (0, pad)))
        imp_dims = jnp.pad(imp_dims, ((0, 0), (0, pad)))
        imp_gates = jnp.pad(imp_gates, ((0, 0), (0, pad)))
        n_imp += pad
    n_tiles = N // n_tile
    ts = n_tile // LANE
    lex_rows = indices_T.shape[0]
    v3 = values_T.reshape(D, N // LANE, LANE)
    i3 = indices_T.reshape(lex_rows, N // LANE, LANE)
    lex_arr = jnp.asarray(lex_dim, jnp.int32).reshape(1)

    def vspec(j):
        # the chosen dim's value plane tile (fully packed DMA)
        return pl.BlockSpec(
            (1, ts, LANE),
            lambda b, n, i, dims, gates, vals, lex, j=j: (
                dims[b, i * unroll + j], n, 0
            ),
        )

    def ispec(j):
        # matching index-plane tile (clamped for CLS dims; gate is forced
        # open for them inside the kernel)
        return pl.BlockSpec(
            (1, ts, LANE),
            lambda b, n, i, dims, gates, vals, lex, j=j: (
                jnp.minimum(dims[b, i * unroll + j], lex_rows - 1), n, 0
            ),
        )

    narrow_out = jnp.dtype(out_dtype) != jnp.dtype(jnp.float32)

    def run(dims, gates, vals):
        Bc = dims.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Bc, n_tiles, n_imp // unroll),
            in_specs=(
                [vspec(j) for j in range(unroll)]
                + [ispec(j) for j in range(unroll)]
            ),
            out_specs=pl.BlockSpec(
                (1, ts, LANE),
                lambda b, n, i, dims, gates, vals, lex: (b, n, 0),
            ),
            scratch_shapes=(
                [pltpu.VMEM((1, ts, LANE), jnp.float32)] if narrow_out else []
            ),
        )
        return pl.pallas_call(
            _make_kernel(unroll, narrow_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Bc, N // LANE, LANE), out_dtype),
            interpret=interpret,
        )(
            dims.astype(jnp.int32), gates.astype(jnp.int32),
            vals.astype(jnp.float32), lex_arr,
            *([v3] * unroll + [i3] * unroll),
        )

    bc = _query_chunk(B, n_imp)
    if bc == B:
        out = run(imp_dims, imp_gates, imp_vals)
    else:
        out = jnp.concatenate([
            run(imp_dims[s:s + bc], imp_gates[s:s + bc], imp_vals[s:s + bc])
            for s in range(0, B, bc)
        ], axis=0)
    return out.reshape(B, N)


def partial_gip_scores_pallas(qv, qi, values_T, indices_T, lex_dim, n_dims,
                              n_tile: int = 4096, interpret: bool = False,
                              unroll: int = 8, out_dtype=jnp.float32):
    """Drop-in twin of ``searcher._partial_gip_scores`` using the kernel."""
    imp_val, imp_dim = jax.lax.top_k(qv, n_dims)
    imp_gate = jnp.take_along_axis(qi, imp_dim, axis=-1)
    return pallas_partial_gip(
        imp_val, imp_dim, imp_gate, values_T, indices_T, lex_dim,
        n_tile=n_tile, interpret=interpret, unroll=unroll,
        out_dtype=out_dtype,
    )


# --------------------------------------------------------------------------
# fused candidate selection (theta pass + in-kernel block reduction)
# --------------------------------------------------------------------------


def _make_candidates_kernel(unroll: int, reduce_block: int,
                            packed_ids: bool = False):
    """Theta-pass kernel emitting per-block (max, argmax-row) planes.

    Identical streaming/accumulation to :func:`_make_kernel`, but instead of
    writing the full ``(B, N)`` score plane, the LAST reduction step
    reduces the f32 accumulator tile over groups of ``reduce_block``
    consecutive sublanes and writes only the per-group winner's score and
    absolute row id.  The reduction is pure VPU work in the tail of a
    DMA-bound kernel (measured VPU-idle, docs/design.md), so it is
    effectively free — and the downstream candidate top-k shrinks by
    ``reduce_block``x while the ``(B, N)`` score write disappears
    entirely.  The analog of the reference's fused score+topk
    (retrieval/gip_retrieval.py:142), restructured for the TPU memory
    system.

    A "block" is the ``reduce_block`` rows sharing a lane within a sublane
    group — an arbitrary but fixed partition of the shard's rows into
    ``N / reduce_block`` groups; candidate recall loses only the rare
    true-top rows that share a block with a better row (expected
    ``topk^2 / (2 N / G)`` collisions — ~2.4 of the top-1000 at 1.64M rows,
    G=8), and the exact rerank that always follows re-scores the survivors.

    ``packed_ids``: emit ONE f32 plane with the winner's group-local index
    packed into the low ``log2(G)`` mantissa bits of its f32 score
    (``bits(score) & -G | j``).  The perturbation is < G ulps, so float
    ordering over the packed plane equals score ordering (ties within
    G ulps break arbitrarily — the exact rerank re-scores anyway), and the
    downstream top-k needs NO ``take_along_axis`` row-id gather (measured
    9.3 ms for (64, 10k) of (64, 205k) — the reason the two-plane variant
    lost e2e): the absolute row id is pure arithmetic of (position, j),
    see :func:`decode_packed_candidates`.
    """
    G = reduce_block

    def _kernel(dims_ref, gates_ref, vals_ref, lex_ref,  # scalar prefetch
                *refs):  # unroll vrows, unroll irows, outs..., acc
        vrows = refs[:unroll]
        irows = refs[unroll:2 * unroll]
        if packed_ids:
            out_ref = refs[2 * unroll]
            acc_ref = refs[2 * unroll + 1]
        else:
            outv_ref = refs[2 * unroll]
            outr_ref = refs[2 * unroll + 1]
            acc_ref = refs[2 * unroll + 2]
        b = pl.program_id(0)
        n = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lex_dim = lex_ref[0]
        acc = jnp.zeros_like(acc_ref[0])
        for j in range(unroll):
            dim = dims_ref[b, i * unroll + j]
            gate_val = gates_ref[b, i * unroll + j]
            v = vals_ref[b, i * unroll + j]
            row = vrows[j][0].astype(jnp.float32)
            gate = jnp.logical_or(
                irows[j][0].astype(jnp.int32) == gate_val, dim >= lex_dim
            )
            acc += jnp.where(gate, row * v, 0.0)
        acc_ref[0] += acc

        @pl.when(i == pl.num_programs(2) - 1)
        def _():
            ts = acc_ref.shape[1]
            x = acc_ref[0].reshape(ts // G, G, LANE)
            best_v = x[:, 0, :]
            best_j = jnp.zeros((ts // G, LANE), jnp.int32)
            for j in range(1, G):
                v = x[:, j, :]
                m = v > best_v  # strict: first max wins (np.argmax rule)
                best_v = jnp.where(m, v, best_v)
                best_j = jnp.where(m, j, best_j)
            if packed_ids:
                bits = jax.lax.bitcast_convert_type(best_v, jnp.int32)
                packed = (bits & jnp.int32(-G)) | best_j
                out_ref[0] = jax.lax.bitcast_convert_type(packed, jnp.float32)
            else:
                g = jax.lax.broadcasted_iota(jnp.int32, (ts // G, LANE), 0)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (ts // G, LANE), 1)
                n0 = n * (ts * LANE)
                outv_ref[0] = best_v.astype(outv_ref.dtype)
                outr_ref[0] = n0 + (g * G + best_j) * LANE + lane

    return _kernel


def decode_packed_candidates(packed, pos, reduce_block: int):
    """Decode ``packed_ids`` kernel winners selected at reduced positions.

    ``packed``: (..., K) f32 values picked from the (B, N/G) packed plane;
    ``pos``: their positions within that plane's lane dim.  Returns
    ``(scores, rows)`` — the winner's f32 score with the id bits cleared
    (< G ulps from the true score) and its absolute shard row id,
    reconstructed with pure arithmetic (no gather): the reduced plane's
    position p maps to rows ``(p // LANE) * G * LANE + j * LANE + p % LANE``
    for group-local winner j (kernel layout: groups of G sublanes within a
    tile, see :func:`_make_candidates_kernel`).
    """
    G = reduce_block
    u = jax.lax.bitcast_convert_type(packed, jnp.int32)
    j = u & (G - 1)
    scores = jax.lax.bitcast_convert_type(u & jnp.int32(-G), jnp.float32)
    rows = (pos // LANE) * (G * LANE) + j * LANE + pos % LANE
    return scores, rows


@functools.partial(
    jax.jit,
    static_argnames=("n_tile", "interpret", "unroll", "out_dtype",
                     "reduce_block", "packed_ids"),
)
def pallas_gip_candidates(
    imp_vals: jax.Array,     # (B, I) f32
    imp_dims: jax.Array,     # (B, I) i32
    imp_gates: jax.Array,    # (B, I) i32
    values_T: jax.Array,     # (D, N) dim-major value plane
    indices_T: jax.Array,    # (lex_dim, N) dim-major index plane
    lex_dim: int | jax.Array,
    n_tile: int = 4096,
    interpret: bool = False,
    unroll: int = 8,
    out_dtype=jnp.bfloat16,
    reduce_block: int = 8,
    packed_ids: bool = False,
):
    """Theta-pass + fused block reduction: ``(B, N/G)`` (scores, row ids).

    Each reduced entry is the best-scoring row of its ``reduce_block``-row
    group (score in ``out_dtype``, absolute row id int32); run the
    candidate top-k over this plane and the winners ARE the candidate rows.

    With ``packed_ids`` (requires power-of-two ``reduce_block``) a SINGLE
    f32 plane is returned, the winner's local index packed into the low
    mantissa bits (``out_dtype`` is ignored — the id bits need the f32
    mantissa); decode the top-k picks with
    :func:`decode_packed_candidates`.
    """
    B, n_imp = imp_vals.shape
    D, N = values_T.shape
    G = reduce_block
    assert N % n_tile == 0 and n_tile % (G * LANE) == 0, (N, n_tile, G)
    assert not packed_ids or (G & (G - 1)) == 0, G
    unroll = max(1, min(unroll, n_imp))
    pad = (-n_imp) % unroll
    if pad:
        imp_vals = jnp.pad(imp_vals, ((0, 0), (0, pad)))
        imp_dims = jnp.pad(imp_dims, ((0, 0), (0, pad)))
        imp_gates = jnp.pad(imp_gates, ((0, 0), (0, pad)))
        n_imp += pad
    n_tiles = N // n_tile
    ts = n_tile // LANE
    lex_rows = indices_T.shape[0]
    v3 = values_T.reshape(D, N // LANE, LANE)
    i3 = indices_T.reshape(lex_rows, N // LANE, LANE)
    lex_arr = jnp.asarray(lex_dim, jnp.int32).reshape(1)

    def vspec(j):
        return pl.BlockSpec(
            (1, ts, LANE),
            lambda b, n, i, dims, gates, vals, lex, j=j: (
                dims[b, i * unroll + j], n, 0
            ),
        )

    def ispec(j):
        return pl.BlockSpec(
            (1, ts, LANE),
            lambda b, n, i, dims, gates, vals, lex, j=j: (
                jnp.minimum(dims[b, i * unroll + j], lex_rows - 1), n, 0
            ),
        )

    out_spec = pl.BlockSpec(
        (1, ts // G, LANE),
        lambda b, n, i, dims, gates, vals, lex: (b, n, 0),
    )
    nr = N // (G * LANE)

    def run(dims, gates, vals):
        Bc = dims.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Bc, n_tiles, n_imp // unroll),
            in_specs=(
                [vspec(j) for j in range(unroll)]
                + [ispec(j) for j in range(unroll)]
            ),
            out_specs=out_spec if packed_ids else (out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((1, ts, LANE), jnp.float32)],
        )
        if packed_ids:
            out_shape = jax.ShapeDtypeStruct((Bc, nr, LANE), jnp.float32)
        else:
            out_shape = (
                jax.ShapeDtypeStruct((Bc, nr, LANE), out_dtype),
                jax.ShapeDtypeStruct((Bc, nr, LANE), jnp.int32),
            )
        return pl.pallas_call(
            _make_candidates_kernel(unroll, G, packed_ids),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            dims.astype(jnp.int32), gates.astype(jnp.int32),
            vals.astype(jnp.float32), lex_arr,
            *([v3] * unroll + [i3] * unroll),
        )

    bc = _query_chunk(B, n_imp)
    if bc == B:
        out = run(imp_dims, imp_gates, imp_vals)
    elif packed_ids:
        out = jnp.concatenate([
            run(imp_dims[s:s + bc], imp_gates[s:s + bc], imp_vals[s:s + bc])
            for s in range(0, B, bc)
        ], axis=0)
    else:
        chunks = [
            run(imp_dims[s:s + bc], imp_gates[s:s + bc], imp_vals[s:s + bc])
            for s in range(0, B, bc)
        ]
        out = (jnp.concatenate([c[0] for c in chunks], axis=0),
               jnp.concatenate([c[1] for c in chunks], axis=0))
    if packed_ids:
        return out.reshape(B, N // G)
    red_v, red_r = out
    return red_v.reshape(B, N // G), red_r.reshape(B, N // G)


def partial_gip_candidates_pallas(qv, qi, values_T, indices_T, lex_dim,
                                  n_dims, n_tile: int = 4096,
                                  interpret: bool = False, unroll: int = 8,
                                  out_dtype=jnp.bfloat16,
                                  reduce_block: int = 8,
                                  packed_ids: bool = False):
    """Fused twin of :func:`partial_gip_scores_pallas`: reduced candidates."""
    imp_val, imp_dim = jax.lax.top_k(qv, n_dims)
    imp_gate = jnp.take_along_axis(qi, imp_dim, axis=-1)
    return pallas_gip_candidates(
        imp_val, imp_dim, imp_gate, values_T, indices_T, lex_dim,
        n_tile=n_tile, interpret=interpret, unroll=unroll,
        out_dtype=out_dtype, reduce_block=reduce_block,
        packed_ids=packed_ids,
    )
