"""SAM mask decoder in flax.

Behavioral spec: reference models/segment_anything/modeling/mask_decoder.py
(MaskDecoder:16-149, MLP:154-176).  The decoder is tiny; the TPU win is
running it *batched over all connected components of all slices at once*
instead of the reference's per-component Python loop
(models/ProtoSAM.py:505-527).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from protosam_tpu.models.layers import MLP, LayerNorm2d
from protosam_tpu.models.sam.transformer import TwoWayTransformer

_gelu = functools.partial(nn.gelu, approximate=False)


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings: jax.Array, image_pe: jax.Array,
                 sparse_prompt_embeddings: jax.Array,
                 dense_prompt_embeddings: jax.Array,
                 multimask_output: bool):
        """image_embeddings: (B, h, w, C) — already one row per prompt set
        (the reference's repeat_interleave is done by the caller when a
        single image serves many prompt sets);
        image_pe: (1, h, w, C); sparse: (B, N, C); dense: (B, h, w, C).

        Returns (masks (B, M, 4h, 4w), iou_pred (B, M)).
        """
        b = sparse_prompt_embeddings.shape[0]
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, self.transformer_dim))
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None],
                              (b, *output_tokens.shape)).astype(self.dtype),
             sparse_prompt_embeddings], axis=1)

        src = image_embeddings + dense_prompt_embeddings
        _, h, w, c = src.shape

        hs, src = TwoWayTransformer(
            depth=2, embedding_dim=self.transformer_dim, num_heads=8,
            mlp_dim=2048, dtype=self.dtype, name="transformer")(
                src, image_pe, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens, :]

        src = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src)
        x = LayerNorm2d(dtype=self.dtype, name="upscale_ln")(x)
        x = _gelu(x)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv2")(x)
        upscaled = _gelu(x)                                   # (B, 4h, 4w, C/8)

        hyper_in = jnp.stack([
            MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                dtype=self.dtype, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i, :])
            for i in range(self.num_mask_tokens)], axis=1)     # (B, M, C/8)

        masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, upscaled,
                           preferred_element_type=jnp.float32)
        iou_pred = MLP(self.iou_head_hidden_dim, self.num_mask_tokens,
                       self.iou_head_depth, dtype=self.dtype,
                       name="iou_prediction_head")(iou_token_out)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
