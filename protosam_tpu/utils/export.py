"""Model export — the TPU-native counterpart of the reference's ONNX
decoder export (segment_anything/utils/onnx.py:17-144, unused by the
pipeline but part of its API surface).

``export_decoder`` serializes the SAM prompt-encoder+mask-decoder as a
portable StableHLO artifact via jax.export; ``load_exported`` rehydrates it
for serving without the Python model definition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_decoder(sam_model, sam_params, *, num_points: int = 2,
                   multimask_output: bool = False) -> bytes:
    """Serialize decode(embedding, points, labels, box) -> (masks, iou)."""
    from jax import export as jexp

    grid = sam_model.image_size // 16

    def decode(params, emb, coords, labels, boxes):
        return sam_model.apply({"params": params}, emb, coords, labels,
                               boxes, None, multimask_output, False,
                               method=sam_model.decode)

    fn = jax.jit(lambda emb, coords, labels, boxes: decode(
        sam_params, emb, coords, labels, boxes))
    args = (
        jax.ShapeDtypeStruct((1, grid, grid, 256), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points), jnp.int32),
        jax.ShapeDtypeStruct((1, 4), jnp.float32),
    )
    exported = jexp.export(fn)(*args)
    return bytes(exported.serialize())


def load_exported(blob: bytes):
    """Rehydrate an exported decoder: returns a callable
    (emb, coords, labels, boxes) -> (low_res_masks, iou)."""
    from jax import export as jexp

    exported = jexp.deserialize(blob)
    return lambda *args: exported.call(*args)
