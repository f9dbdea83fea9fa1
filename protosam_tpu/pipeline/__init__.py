from protosam_tpu.pipeline.protosam import ProtoSAM, ProtoSAMConfig  # noqa: F401
