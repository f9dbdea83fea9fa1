"""SAM model registry (reference models/segment_anything/build_sam.py:14-107).

vit_h: 1280×32, heads 16, global blocks (7, 15, 23, 31)
vit_l: 1024×24, heads 16, global blocks (5, 11, 17, 23)
vit_b:  768×12, heads 12, global blocks (2, 5, 8, 11)
MedSAM is a vit_b checkpoint (reference ProtoMedSAM uses the same registry).
"""

from __future__ import annotations

import jax.numpy as jnp

from protosam_tpu.models.sam.sam import Sam

_CONFIGS = {
    "vit_h": dict(encoder_embed_dim=1280, encoder_depth=32,
                  encoder_num_heads=16,
                  encoder_global_attn_indexes=(7, 15, 23, 31)),
    "vit_l": dict(encoder_embed_dim=1024, encoder_depth=24,
                  encoder_num_heads=16,
                  encoder_global_attn_indexes=(5, 11, 17, 23)),
    "vit_b": dict(encoder_embed_dim=768, encoder_depth=12,
                  encoder_num_heads=12,
                  encoder_global_attn_indexes=(2, 5, 8, 11)),
    # test-size model for CPU-runnable configs (not in the reference)
    "vit_t": dict(encoder_embed_dim=160, encoder_depth=2,
                  encoder_num_heads=4,
                  encoder_global_attn_indexes=(1,)),
}


def build_sam(model_type: str = "vit_h", dtype=jnp.float32,
              image_size: int = 1024, **overrides) -> Sam:
    if model_type not in _CONFIGS:
        raise KeyError(f"unknown SAM model type {model_type!r}; "
                       f"have {sorted(_CONFIGS)}")
    # production bf16 builds keep the decode tail (prompt encoder + mask
    # decoder) in f32: ~1% of pipeline FLOPs, but its 0-thresholded logits
    # are where bf16 rounding moves mask boundaries (PARITY.md drift).
    overrides.setdefault("decoder_dtype", jnp.float32)
    return Sam(image_size=image_size, dtype=dtype, **_CONFIGS[model_type],
               **overrides)


sam_model_registry = {k: (lambda k=k, **kw: build_sam(k, **kw))
                      for k in _CONFIGS}
