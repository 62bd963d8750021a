from kirag_tpu.ops.pooling import cls_pool, l2_normalize, masked_mean_pool
from kirag_tpu.ops.mips import topk_mips, sharded_topk_mips

__all__ = [
    "cls_pool",
    "l2_normalize",
    "masked_mean_pool",
    "topk_mips",
    "sharded_topk_mips",
]
