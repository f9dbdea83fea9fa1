from protosam_tpu.models.dinov2.vit import DinoVisionTransformer, build_dinov2  # noqa: F401
