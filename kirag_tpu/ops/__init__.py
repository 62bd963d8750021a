from kirag_tpu.ops.pooling import cls_pool, l2_normalize, masked_mean_pool
from kirag_tpu.ops.mips import topk_mips, sharded_topk_mips
from kirag_tpu.ops.pallas_exact import (
    exact_topk_mips,
    sharded_exact_topk_mips,
    topk_lastdim,
)

__all__ = [
    "cls_pool",
    "l2_normalize",
    "masked_mean_pool",
    "topk_mips",
    "sharded_topk_mips",
    "exact_topk_mips",
    "sharded_exact_topk_mips",
    "topk_lastdim",
]
