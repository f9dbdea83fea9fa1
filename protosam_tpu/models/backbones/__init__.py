from protosam_tpu.models.backbones.resnet import DeeplabRes101Encoder  # noqa: F401
