"""Int8 quantization of index value planes.

A TPU-friendly alternative to the reference's faiss ``IndexPQ(m=64, 8 bit)``
compression (retrieval/quantize_index.py:27-38): symmetric per-dimension int8
scaling of the value plane.  NOTE this is a *distinct, larger* memory budget
than PQ64 — 1 byte/dim (896 B/row for 768+128 dims) vs PQ's 64 B/row; the
equal-budget PQ mode lives in ``ops/pq.py``.  See the recall/memory table in
docs/design.md ("Quantization recall") for the int8 vs PQ64 vs f16 trade-off.

Dequantization fuses into the scoring matmul: ``(q . scale) @ int8_values`` —
the scale folds into the query side so the corpus stays int8 in HBM end to
end.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class QuantizedPlane:
    """Per-dimension symmetric int8 quantized value plane."""

    values_i8: jax.Array  # (N, d) int8
    scales: jax.Array  # (d,) float32 — dequant = values_i8 * scales


def quantize_per_dim(values: jax.Array) -> QuantizedPlane:
    """Quantize ``(N, d)`` float values to int8 with per-dim scales."""
    v32 = values.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(v32), axis=0)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(v32 / scales), -127, 127).astype(jnp.int8)
    return QuantizedPlane(values_i8=q, scales=scales)


def dequantize(plane: QuantizedPlane) -> jax.Array:
    return plane.values_i8.astype(jnp.float32) * plane.scales


def quantized_ip_scores(qv: jax.Array, plane: QuantizedPlane) -> jax.Array:
    """IP scores against an int8 plane with the scale folded into the query.

    ``scores[b, n] = sum_j qv[b,j]*scale[j] * int8[n,j]`` — one bf16/int8
    matmul on the MXU; the corpus plane is never dequantized in HBM.
    """
    q_scaled = (qv.astype(jnp.float32) * plane.scales).astype(jnp.bfloat16)
    p = plane.values_i8.astype(jnp.bfloat16)
    return jnp.dot(
        q_scaled, p.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def quantize_per_dim_np(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side twin for offline index building."""
    v32 = values.astype(np.float32)
    absmax = np.max(np.abs(v32), axis=0)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(v32 / scales), -127, 127).astype(np.int8)
    return q, scales
