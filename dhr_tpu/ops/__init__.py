"""Core jitted ops: densify, aggregate, GIP scoring, top-k, quantization."""

from dhr_tpu.ops.aggregate import aggregate, cal_remove_dim, merge_reps
from dhr_tpu.ops.densify import (
    REMOVE_DIMS_BY_MODEL,
    WORDPIECE_REMOVE_DIMS,
    densify,
    densify_sparse_rows,
    undensify,
)
from dhr_tpu.ops.gip import (
    gip_scores_masked,
    gip_scores_pairwise,
    gip_scores_subindex,
    ip_scores,
    pad_indices_for_cls,
    scale_cls_tail,
    threshold_query_values,
)
from dhr_tpu.ops.pallas_gip import (
    pallas_partial_gip,
    partial_gip_scores_pallas,
)
from dhr_tpu.ops.quantize import (
    QuantizedPlane,
    dequantize,
    quantize_per_dim,
    quantize_per_dim_np,
    quantized_ip_scores,
)
from dhr_tpu.ops.topk import blockwise_topk, merge_topk, sharded_topk_merge

__all__ = [
    "REMOVE_DIMS_BY_MODEL",
    "WORDPIECE_REMOVE_DIMS",
    "QuantizedPlane",
    "aggregate",
    "blockwise_topk",
    "cal_remove_dim",
    "densify",
    "densify_sparse_rows",
    "dequantize",
    "gip_scores_masked",
    "gip_scores_pairwise",
    "gip_scores_subindex",
    "ip_scores",
    "merge_reps",
    "merge_topk",
    "pad_indices_for_cls",
    "pallas_partial_gip",
    "partial_gip_scores_pallas",
    "quantize_per_dim",
    "quantize_per_dim_np",
    "quantized_ip_scores",
    "scale_cls_tail",
    "sharded_topk_merge",
    "threshold_query_values",
    "undensify",
]
