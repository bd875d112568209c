"""Product-quantization codebooks for index compression.

Reference equivalence: ``retrieval/quantize_index.py:27-38`` builds a faiss
``IndexPQ(dim, m=64, 8 bit, METRIC_INNER_PRODUCT)`` for CPU candidate
generation and ``PQ_IP_retrieval`` (gip_retrieval.py:167-231) reranks its
candidates with exact GIP.  This module is the TPU-native equivalent:

- :func:`train_pq` — Lloyd's k-means per subspace, vmapped over the ``m``
  subspaces so all codebooks train as one batched device program.
- :func:`encode_pq` / :func:`decode_pq` — codes ``(N, m)`` uint8 at
  ``m`` bytes/row (64 bytes/row for m=64 — the same budget as faiss PQ64,
  vs 896 B/row for f16 planes + 768 B/row u8 indices).
- :func:`pq_luts` + :func:`pq_ip_scores` — asymmetric-distance scoring:
  per-query lookup tables ``lut[b, j, c] = q_sub . centroid`` and
  ``score[b, n] = sum_j lut[b, j, codes[n, j]]``.  The gather is expressed
  as ``m`` one-hot (N, 256) x (256, B) matmuls so it lands on the MXU
  instead of a scalar gather unit.

Scores are exact inner products against the *reconstructed* vectors, i.e.
identical to faiss IndexPQ search semantics (ADC).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

N_CENTROIDS = 256  # 8-bit codes


def _split(values: jax.Array, m: int) -> jax.Array:
    """(N, D) -> (m, N, d_sub); D must divide by m."""
    N, D = values.shape
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m} subspaces")
    d_sub = D // m
    return jnp.transpose(values.reshape(N, m, d_sub), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("m", "iters"))
def train_pq(
    values: jax.Array, m: int, iters: int = 15, seed: int = 0
) -> jax.Array:
    """K-means codebooks ``(m, 256, d_sub)`` over the value plane.

    Standard Lloyd's with random-row init; empty clusters keep their previous
    centroid (faiss behaves similarly for the purposes of this index).
    Train on a row sample for large N — 64k rows is plenty for 256 centroids.
    """
    sub = _split(values.astype(jnp.float32), m)  # (m, N, d)
    N = sub.shape[1]
    init_rows = jax.random.choice(
        jax.random.PRNGKey(seed), N, (N_CENTROIDS,), replace=N < N_CENTROIDS
    )
    centroids = sub[:, init_rows, :]  # (m, 256, d)

    def assign(x, c):
        # (N, 256) squared L2 via the matmul identity; argmin per row
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
            + jnp.sum(c * c, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    def update(x, codes, c_prev):
        oh = jax.nn.one_hot(codes, N_CENTROIDS, dtype=jnp.float32)  # (N, 256)
        counts = jnp.sum(oh, axis=0)  # (256,)
        sums = jnp.dot(oh.T, x, preferred_element_type=jnp.float32)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], means, c_prev)

    def step(c, _):
        codes = jax.vmap(assign)(sub, c)
        return jax.vmap(update)(sub, codes, c), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@functools.partial(jax.jit, static_argnames=())
def encode_pq(values: jax.Array, centroids: jax.Array) -> jax.Array:
    """Codes ``(N, m)`` uint8: nearest centroid per subspace."""
    m = centroids.shape[0]
    sub = _split(values.astype(jnp.float32), m)  # (m, N, d)

    def assign(x, c):
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
            + jnp.sum(c * c, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    codes = jax.vmap(assign)(sub, centroids)  # (m, N)
    return codes.T.astype(jnp.uint8)


@jax.jit
def decode_pq(codes: jax.Array, centroids: jax.Array) -> jax.Array:
    """Reconstruct ``(N, D)`` f32 from codes."""
    m, _, d_sub = centroids.shape
    gathered = jnp.take_along_axis(
        centroids[None, :, :, :],                      # (1, m, 256, d)
        codes.astype(jnp.int32)[:, :, None, None],     # (N, m, 1, 1)
        axis=2,
    )[:, :, 0, :]                                      # (N, m, d)
    return gathered.reshape(codes.shape[0], m * d_sub)


@jax.jit
def pq_luts(qv: jax.Array, centroids: jax.Array) -> jax.Array:
    """Per-query inner-product tables ``(B, m, 256)``."""
    m, _, d_sub = centroids.shape
    q_sub = qv.astype(jnp.float32).reshape(qv.shape[0], m, d_sub)
    return jnp.einsum(
        "bmd,mcd->bmc", q_sub, centroids.astype(jnp.float32)
    )


def pq_ip_scores(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """ADC scores ``(B, N)``: ``sum_j lut[b, j, codes[n, j]]``.

    Expressed as ``m`` one-hot matmuls (N, 256) x (256, B) so the lookup
    rides the MXU; the accumulator stays (N, B) f32 and transposes once.
    """
    m = luts.shape[1]
    n = codes.shape[0]
    b = luts.shape[0]

    def body(j, acc):
        oh = jax.nn.one_hot(codes[:, j], N_CENTROIDS, dtype=jnp.bfloat16)
        tab = luts[:, j, :].T.astype(jnp.bfloat16)  # (256, B)
        return acc + jnp.dot(oh, tab, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, m, body, jnp.zeros((n, b), jnp.float32))
    return acc.T


def pq_ip_scores_gather(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """Gather formulation of :func:`pq_ip_scores` (oracle / CPU path)."""
    # (B, N, m): lut[b, j, codes[n, j]]
    gathered = jnp.take_along_axis(
        luts[:, None, :, :],                            # (B, 1, m, 256)
        codes.astype(jnp.int32).T[None, None, :, :].transpose(0, 3, 2, 1),
        axis=3,
    )
    return jnp.sum(gathered[..., 0], axis=-1)


# ---------------------------------------------------------------- host side


def train_encode_pq_np(
    values: np.ndarray, m: int, iters: int = 15, seed: int = 0,
    train_sample: int = 65536,
) -> tuple[np.ndarray, np.ndarray]:
    """Offline build: returns ``(codes (N, m) u8, centroids (m, 256, d))``."""
    v = np.asarray(values, np.float32)
    if v.shape[0] > train_sample:
        rows = np.random.default_rng(seed).choice(
            v.shape[0], train_sample, replace=False
        )
        train_rows = v[rows]
    else:
        train_rows = v
    centroids = np.asarray(train_pq(jnp.asarray(train_rows), m, iters, seed))
    codes = np.asarray(encode_pq(jnp.asarray(v), jnp.asarray(centroids)))
    return codes, centroids
