from protosam_tpu.models.alpnet.fewshot import FewShotSeg  # noqa: F401
