"""protosam_tpu — a TPU-native one-shot medical image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ProtoSAM
(training-free one-shot segmentation: ALPNet coarse prototypes -> device-side
prompt extraction -> SAM refinement), designed TPU-first:

* all model math is jit-compiled XLA with static shapes,
* the ALP prototype pool/match stage is a fused Pallas kernel,
* connected components / point / box prompt extraction run on device
  (no host round-trip in the middle of the pipeline),
* volumes are processed as batched slice stacks, shardable over a
  ``jax.sharding.Mesh``.

Reference behavior parity is documented per-module via ``file:line`` citations
into the reference repository.
"""

__version__ = "0.1.0"

# Persistent XLA compile cache: multi-minute encoder compiles (vit_h ~380 s+)
# must be paid once per machine, not once per process.  No-op under
# PTPU_NO_COMPILE_CACHE=1; safe before or after jax backend init.
from protosam_tpu.utils.compile_cache import enable_compile_cache as _ecc

_ecc()
del _ecc
