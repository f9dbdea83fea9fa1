from protosam_tpu.parallel.sharding import (  # noqa: F401
    encoder_param_sharding,
    make_mesh,
    shard_batch,
)
from protosam_tpu.parallel.pipeline import (  # noqa: F401
    PipelinedVolumeRunner,
)
