from protosam_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_bilinear_antialias,
    resize_bicubic_antialias,
)
from protosam_tpu.ops.pooling import avg_pool2d
from protosam_tpu.ops.norm import safe_l2_normalize, cosine_similarity

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "resize_bilinear_antialias",
    "resize_bicubic_antialias",
    "avg_pool2d",
    "safe_l2_normalize",
    "cosine_similarity",
]
