from protosam_tpu.native.feeder import (  # noqa: F401
    native_available,
    read_volume_native,
    preprocess_volume_native,
)
