from protosam_tpu.pipeline.protosam import ProtoSAM, ProtoSAMConfig  # noqa: F401
from protosam_tpu.pipeline.protomedsam import ProtoMedSAM  # noqa: F401
