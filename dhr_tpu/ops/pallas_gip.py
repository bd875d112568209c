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


def _kernel(dims_ref, gates_ref, vals_ref, lex_ref,   # scalar prefetch (SMEM)
            vrow_ref, irow_ref,                       # VMEM tiles (1, TN)
            out_ref):                                 # VMEM tile (1, TN)
    b = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    dim = dims_ref[b, i]
    gate_val = gates_ref[b, i]
    v = vals_ref[b, i]
    lex_dim = lex_ref[0]
    row = vrow_ref[0, :].astype(jnp.float32)
    gate = jnp.where(
        dim < lex_dim,
        irow_ref[0, :].astype(jnp.int32) == gate_val,
        True,
    )
    out_ref[0, :] += jnp.where(gate, row * v, 0.0)


@functools.partial(jax.jit, static_argnames=("n_tile", "interpret"))
def pallas_partial_gip(
    imp_vals: jax.Array,     # (B, I) f32 — thresholded important values
    imp_dims: jax.Array,     # (B, I) i32 — dim ids
    imp_gates: jax.Array,    # (B, I) i32 — expected argmax index per dim
    values_T: jax.Array,     # (D, N) bf16/i8 dim-major value plane
    indices_T: jax.Array,    # (lex_dim, N) i8/i16 dim-major index plane
    lex_dim: int | jax.Array,
    n_tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Partial GIP scores (B, N) via the scalar-prefetch streaming kernel."""
    B, n_imp = imp_vals.shape
    D, N = values_T.shape
    assert N % n_tile == 0, (N, n_tile)
    n_tiles = N // n_tile
    lex_arr = jnp.asarray(lex_dim, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_tiles, n_imp),
        in_specs=[
            # one dim-row tile of the value plane, chosen by scalar prefetch
            pl.BlockSpec(
                (1, n_tile),
                lambda b, n, i, dims, gates, vals, lex: (dims[b, i], n),
            ),
            # matching index-plane row tile (clamped for CLS dims)
            pl.BlockSpec(
                (1, n_tile),
                lambda b, n, i, dims, gates, vals, lex: (
                    jnp.minimum(dims[b, i], indices_T.shape[0] - 1), n
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_tile), lambda b, n, i, dims, gates, vals, lex: (b, n)
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(
        imp_dims.astype(jnp.int32), imp_gates.astype(jnp.int32),
        imp_vals.astype(jnp.float32), lex_arr,
        values_T, indices_T,
    )


def partial_gip_scores_pallas(qv, qi, values_T, indices_T, lex_dim, n_dims,
                              n_tile: int = 2048, interpret: bool = False):
    """Drop-in twin of ``searcher._partial_gip_scores`` using the kernel."""
    imp_val, imp_dim = jax.lax.top_k(qv, n_dims)
    imp_gate = jnp.take_along_axis(qi, imp_dim, axis=-1)
    return pallas_partial_gip(
        imp_val, imp_dim, imp_gate, values_T, indices_T, lex_dim,
        n_tile=n_tile, interpret=interpret,
    )
