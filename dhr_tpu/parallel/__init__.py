"""Device mesh and sharding helpers."""

from dhr_tpu.parallel.mesh import (
    DATA_AXIS,
    HOST_AXIS,
    INDEX_AXIS,
    global_put,
    make_hybrid_mesh,
    make_mesh,
    pad_rows_to_multiple,
    replicate,
    replicated,
    row_axes,
    row_sharded,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "HOST_AXIS",
    "INDEX_AXIS",
    "global_put",
    "make_hybrid_mesh",
    "make_mesh",
    "pad_rows_to_multiple",
    "replicate",
    "replicated",
    "row_axes",
    "row_sharded",
    "shard_batch",
]
