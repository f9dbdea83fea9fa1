from protosam_tpu.models.sam.registry import build_sam, sam_model_registry  # noqa: F401
