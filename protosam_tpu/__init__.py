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
