"""The retrieval index: packed value/index planes, sharded across the mesh.

Layout (logical format parity with the reference's embedding shards,
driver/encode.py:155-195: f16 values ``[dlr_dims ‖ cls_dims]`` + uint8 argmax
indices):

- ``values``  (N, lex_dim + cls_dim) float16/bfloat16
- ``indices`` (N, lex_dim) uint8/int16 (None for dense/agg single-vector)
- ``docids``  (N,) object/str array

TPU-first additions the reference lacks:

- a **dim-major** twin of both planes, ``values_T``/``indices_T`` of shape
  (D, N): the theta-approximate GIP pass reads only the query's important
  dims, and dim-major rows make each such read one contiguous DMA instead of
  an (N, D) column gather (reference gip_retrieval.py:135 gathers columns of
  a row-major torch tensor);
- row-sharding over the device mesh ``index`` axis with per-device offsets
  (replacing the process-level ``--total_shrad/--shrad`` slicing and the
  file-based merges of retrieval/index.py / merge.result.py);
- optional per-dim int8 quantization of the value planes (1 byte/dim — an
  8x cut vs f16+index planes, NOT the reference's PQ64 64 B/row budget);
- optional PQ codebooks (``quantize_pq``): codes (N, m) u8 + centroids,
  matching faiss ``IndexPQ(m=64, 8 bit, IP)`` bytes/row exactly
  (quantize_index.py:27-38) for the compressed candidate-generation mode.

On-disk format is ``.npz`` plus a sidecar ``.docids.json``; a compatibility
reader ingests the reference's pickle triple ``[values, indices, ids]``.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import pickle

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dhr_tpu.ops.quantize import quantize_per_dim_np


@dataclasses.dataclass
class PackedIndex:
    """Host-side packed index (numpy); device residency via DeviceIndex."""

    values: np.ndarray                 # (N, lex+cls) f16
    indices: np.ndarray | None         # (N, lex) u8/i16 or None
    docids: np.ndarray                 # (N,) str
    lex_dim: int
    value_scales: np.ndarray | None = None  # (D,) f32 when values are int8
    pq_codes: np.ndarray | None = None       # (N, m) u8 PQ codes
    pq_centroids: np.ndarray | None = None   # (m, 256, D/m) f32 codebooks

    @property
    def num_rows(self) -> int:
        return self.values.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[1]

    @property
    def cls_dim(self) -> int:
        return self.dim - self.lex_dim if self.indices is not None else 0

    # -- construction --------------------------------------------------

    @staticmethod
    def merge(shards: list["PackedIndex"]) -> "PackedIndex":
        """Concatenate shard rows (replaces retrieval/index.py:26-47)."""
        has_idx = shards[0].indices is not None
        return PackedIndex(
            values=np.concatenate([s.values for s in shards], axis=0),
            indices=(
                np.concatenate([s.indices for s in shards], axis=0)
                if has_idx else None
            ),
            docids=np.concatenate([s.docids for s in shards]),
            lex_dim=shards[0].lex_dim,
        )

    def quantize(self) -> "PackedIndex":
        """Per-dim int8 quantization of the value plane."""
        q, scales = quantize_per_dim_np(self.values)
        return dataclasses.replace(self, values=q, value_scales=scales)

    def quantize_pq(self, m: int = 64, iters: int = 15,
                    seed: int = 0) -> "PackedIndex":
        """Attach PQ codebooks: codes (N, m) u8 + (m, 256, D/m) centroids.

        Byte-for-byte the reference's faiss ``IndexPQ(dim, 64, 8, IP)``
        storage (quantize_index.py:27-38); candidate generation scores the
        codes (ADC), rerank uses the full planes exactly like the
        reference's ``PQ_IP_retrieval`` (gip_retrieval.py:167-231).
        """
        if self.value_scales is not None:
            raise ValueError("PQ-quantize the float index, not the int8 one")
        from dhr_tpu.ops.pq import train_encode_pq_np

        codes, centroids = train_encode_pq_np(
            self.values.astype(np.float32), m, iters=iters, seed=seed
        )
        return dataclasses.replace(
            self, pq_codes=codes, pq_centroids=centroids
        )

    def slice_rows(self, start: int, stop: int) -> "PackedIndex":
        return dataclasses.replace(
            self,
            values=self.values[start:stop],
            indices=None if self.indices is None else self.indices[start:stop],
            docids=self.docids[start:stop],
            pq_codes=None if self.pq_codes is None
            else self.pq_codes[start:stop],
        )

    # -- persistence ---------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = {"values": self.values, "lex_dim": np.asarray(self.lex_dim)}
        if self.indices is not None:
            arrays["indices"] = self.indices
        if self.value_scales is not None:
            arrays["value_scales"] = self.value_scales
        if self.pq_codes is not None:
            arrays["pq_codes"] = self.pq_codes
            arrays["pq_centroids"] = self.pq_centroids
        np.savez(path, **arrays)
        with open(self._docids_path(path), "w") as f:
            json.dump([str(d) for d in self.docids], f)

    @staticmethod
    def load(path: str) -> "PackedIndex":
        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            values = z["values"]
            indices = z["indices"] if "indices" in z.files else None
            lex_dim = int(z["lex_dim"])
            scales = z["value_scales"] if "value_scales" in z.files else None
            pq_codes = z["pq_codes"] if "pq_codes" in z.files else None
            pq_centroids = (
                z["pq_centroids"] if "pq_centroids" in z.files else None
            )
        with open(PackedIndex._docids_path(path)) as f:
            docids = np.asarray(json.load(f), dtype=object)
        return PackedIndex(values, indices, docids, lex_dim, scales,
                           pq_codes, pq_centroids)

    @staticmethod
    def _docids_path(path: str) -> str:
        base = path[:-4] if path.endswith(".npz") else path
        return base + ".docids.json"

    @staticmethod
    def load_reference_pickle(path: str, lex_dim: int | None = None) -> "PackedIndex":
        """Ingest the reference's ``[values, indices, ids]`` pickle shard."""
        with open(path, "rb") as f:
            values, indices, ids = pickle.load(f)
        if lex_dim is None:
            lex_dim = indices.shape[1] if indices is not None else values.shape[1]
        return PackedIndex(
            values=np.asarray(values),
            indices=None if indices is None else np.asarray(indices),
            docids=np.asarray([str(i) for i in ids], dtype=object),
            lex_dim=lex_dim,
        )

    @staticmethod
    def merge_glob(pattern: str, lex_dim: int | None = None) -> "PackedIndex":
        """Merge shard files (.npz or reference pickles) matching a glob."""
        paths = sorted(glob.glob(pattern))
        if not paths:
            raise FileNotFoundError(pattern)
        shards = []
        for p in paths:
            if p.endswith(".npz"):
                shards.append(PackedIndex.load(p))
            else:
                shards.append(PackedIndex.load_reference_pickle(p, lex_dim))
        return PackedIndex.merge(shards)


def _check_layout(layout: str) -> None:
    if layout not in ("both", "row", "dim"):
        raise ValueError(
            f"layout must be 'both', 'row', or 'dim'; got {layout!r}"
        )


@dataclasses.dataclass
class DeviceIndex:
    """Device-resident index, rows sharded over the mesh ``index`` axis.

    Keeps row-major planes (rerank gathers) and/or dim-major twins (the
    theta-pass streams one dim row per step) depending on ``layout`` —
    "both" (gip+rerank), "row" (ip/pq candidates + rerank; halves index
    HBM), or "dim" (gip without rerank).  All arrays are jax Arrays with
    ``NamedSharding``; a 1-device mesh degrades to plain residency.
    """

    values: jax.Array | None         # (N, D) bf16 or int8
    values_T: jax.Array | None       # (D, N)
    indices: jax.Array | None        # (N, lex) int8/int16 (signed for TPU)
    indices_T: jax.Array | None      # (lex, N)
    docids: np.ndarray               # host-side
    lex_dim: int
    num_rows: int                    # true rows (before device-count padding)
    value_scales: jax.Array | None = None
    pq_codes: jax.Array | None = None       # (N, m) int32 (TPU-friendly)
    pq_centroids: jax.Array | None = None   # (m, 256, D/m) f32, replicated
    mesh: Mesh | None = None
    # mesh axes the rows are sharded over — ("host", "index") on a hybrid
    # multi-host mesh (DCN leading), ("index",) otherwise
    shard_axes: tuple = ("index",)

    @property
    def dim(self) -> int:
        if self.values is not None:
            return self.values.shape[1]
        return self.values_T.shape[0]

    @property
    def has_gip_planes(self) -> bool:
        """Dim-major index plane present (gip stage-1 possible)."""
        return self.indices_T is not None

    @property
    def cls_dim(self) -> int:
        has_idx = self.indices is not None or self.indices_T is not None
        return self.dim - self.lex_dim if has_idx else 0

    @staticmethod
    def from_arrays(
        values,
        indices,
        docids: np.ndarray,
        lex_dim: int,
        mesh: Mesh | None = None,
        axis: str = "index",
        value_scales=None,
        layout: str = "both",
    ) -> "DeviceIndex":
        """Build from arrays already on device (e.g. synthetic benches or a
        just-encoded corpus) — transposes happen on device, no host copy.
        Row count must already be a multiple of the mesh size.

        ``layout``: ``"both"`` keeps row- and dim-major planes (the
        gip+rerank default), ``"row"`` only row-major (ip/pq candidate
        modes + rerank — halves index HBM), ``"dim"`` only dim-major
        (gip without rerank).
        """
        import jax.numpy as jnp

        from dhr_tpu.parallel import row_axes

        _check_layout(layout)
        axes = row_axes(mesh, axis)

        def put(x, spec):
            if mesh is None:
                return x
            from dhr_tpu.parallel import global_put

            return global_put(x, mesh, spec)

        values = jnp.asarray(values)
        dv = put(values, P(axes, None)) if layout != "dim" else None
        # +0 forces a materialized copy
        dvt = put(values.T + 0, P(None, axes)) if layout != "row" else None
        di = dit = None
        if indices is not None:
            indices = jnp.asarray(indices)
            if indices.dtype == jnp.uint8:
                indices = indices.astype(jnp.int8)
            if layout != "dim":
                di = put(indices, P(axes, None))
            if layout != "row":
                dit = put(indices.T + 0, P(None, axes))
        return DeviceIndex(
            values=dv, values_T=dvt, indices=di, indices_T=dit,
            docids=docids, lex_dim=lex_dim, num_rows=values.shape[0],
            value_scales=None if value_scales is None else jnp.asarray(
                value_scales
            ),
            mesh=mesh, shard_axes=axes,
        )

    @staticmethod
    def from_packed(
        packed: PackedIndex,
        mesh: Mesh | None = None,
        axis: str = "index",
        value_dtype=None,
        layout: str = "both",
    ) -> "DeviceIndex":
        """``layout``: see :meth:`from_arrays` — "row" / "dim" keep a single
        plane orientation and halve index HBM vs "both"."""
        import jax.numpy as jnp

        from dhr_tpu.parallel import row_axes

        _check_layout(layout)
        axes = row_axes(mesh, axis)
        n_dev = 1
        if mesh is not None:
            for a in axes:
                n_dev *= mesh.shape[a]
        n = packed.num_rows
        pad = (-n) % n_dev

        values = packed.values
        if value_dtype is None:
            value_dtype = jnp.int8 if values.dtype == np.int8 else jnp.bfloat16
        values = np.pad(values, [(0, pad), (0, 0)])
        indices = packed.indices
        if indices is not None:
            # uint8 -> int8 bit-identical reinterpret is unsafe for values
            # >= 128; widen to int16 instead when needed.
            if indices.dtype == np.uint8:
                indices = (
                    indices.astype(np.int8)
                    if indices.max(initial=0) < 128
                    else indices.astype(np.int16)
                )
            indices = np.pad(indices, [(0, pad), (0, 0)])

        def put(arr, spec):
            if mesh is None:
                return jnp.asarray(arr)
            from dhr_tpu.parallel import global_put

            return global_put(arr, mesh, spec)

        row_spec = P(axes, None)
        col_spec = P(None, axes)
        dv = dvt = None
        if layout != "dim":
            dv = put(values.astype(value_dtype) if value_dtype != jnp.int8
                     else values, row_spec)
        if layout != "row":
            dvt = put(
                np.ascontiguousarray(values.T).astype(value_dtype)
                if value_dtype != jnp.int8
                else np.ascontiguousarray(values.T),
                col_spec,
            )
        di = dit = None
        if indices is not None:
            if layout != "dim":
                di = put(indices, row_spec)
            if layout != "row":
                dit = put(np.ascontiguousarray(indices.T), col_spec)
        scales = None
        if packed.value_scales is not None:
            scales = put(packed.value_scales.astype(np.float32), P(None))
        pq_codes = pq_centroids = None
        if packed.pq_codes is not None:
            pq_codes = put(
                np.pad(packed.pq_codes, [(0, pad), (0, 0)]).astype(np.int32),
                row_spec,
            )
            pq_centroids = put(
                packed.pq_centroids.astype(np.float32), P(None, None, None)
            )
        return DeviceIndex(
            values=dv, values_T=dvt, indices=di, indices_T=dit,
            docids=packed.docids, lex_dim=packed.lex_dim, num_rows=n,
            value_scales=scales, pq_codes=pq_codes,
            pq_centroids=pq_centroids, mesh=mesh, shard_axes=axes,
        )
