"""SAM prompt encoder in flax — static-shape, batched over components.

Behavioral spec: reference models/segment_anything/modeling/prompt_encoder.py
(PromptEncoder:16-168, PositionEmbeddingRandom:171-214).  The TPU redesign
always takes a fixed-size padded point set (labels -1 mark padding — the
same "not a point" convention the reference uses for its pad row) and a
fixed box slot with a validity flag, so one jitted program serves every
component count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from protosam_tpu.models.layers import LayerNorm2d

import functools

_gelu = functools.partial(nn.gelu, approximate=False)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference prompt_encoder.py:171-214).

    The gaussian matrix is a checkpoint buffer; modeled as a param here.
    """

    num_pos_feats: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords01: jax.Array) -> jax.Array:
        """coords01: (..., 2) in [0,1] -> (..., 2*num_pos_feats)."""
        g = self.param("positional_encoding_gaussian_matrix",
                       nn.initializers.normal(1.0), (2, self.num_pos_feats))
        c = 2.0 * coords01.astype(jnp.float32) - 1.0
        c = c @ g.astype(jnp.float32)
        c = 2.0 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1).astype(self.dtype)

    def grid(self, size: tuple[int, int]) -> jax.Array:
        """Dense PE for an (h, w) grid -> (h, w, C).  Reference
        prompt_encoder.py:194-205 (cumsum-0.5 pixel centers)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy = jnp.broadcast_to(y[:, None], (h, w))
        xx = jnp.broadcast_to(x[None, :], (h, w))
        return self(jnp.stack([xx, yy], axis=-1))


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask) prompt embeddings.

    embed_dim 256, image_embedding 64², input image 1024² per reference
    build_sam.py:83-88.
    """

    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2,
                                                dtype=self.dtype)
        # 4 point embeddings: [neg point, pos point, box TL, box BR]
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.mask_downscaling = [
            nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_conv1"),
            LayerNorm2d(dtype=self.dtype, name="mask_down_ln1"),
            nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_conv2"),
            LayerNorm2d(dtype=self.dtype, name="mask_down_ln2"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    name="mask_down_conv3"),
        ]

    def _pe_points(self, coords: jax.Array) -> jax.Array:
        """Normalize pixel coords by input size then PE
        (reference forward_with_coords, prompt_encoder.py:207-214)."""
        c = coords.astype(jnp.float32)
        c = c / jnp.asarray([self.input_image_size[1], self.input_image_size[0]],
                            jnp.float32)
        return self.pe_layer(c)

    def embed_points(self, coords: jax.Array, labels: jax.Array,
                     pad: bool = True) -> jax.Array:
        """coords (B, P, 2) xy pixels; labels (B, P) in {1, 0, -1}.

        Reference _embed_points (prompt_encoder.py:73-91): +0.5 pixel-center
        shift; when no box accompanies the points a (0,0)/-1 pad row is
        appended (our padded layout passes explicit -1 rows instead, which
        is the identical computation).
        """
        if pad:
            b = coords.shape[0]
            coords = jnp.concatenate(
                [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        pe = self._pe_points(coords + 0.5)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point_embed[0], 0.0)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0][0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1][0], 0.0)
        return pe.astype(self.dtype)

    def embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes (B, 4) xyxy -> (B, 2, C) corner embeddings
        (reference _embed_boxes, prompt_encoder.py:93-100)."""
        corners = (boxes.reshape(-1, 2, 2) + 0.5)
        # accumulate in f32: the params are f32 and a f32 scatter-add into a
        # lower-precision pe array is a hard error in future JAX
        pe = self._pe_points(corners).astype(jnp.float32)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3][0])
        return pe.astype(self.dtype)

    def embed_masks(self, masks: jax.Array) -> jax.Array:
        """masks (B, H, W, 1) -> (B, H/4, W/4, C)."""
        x = masks
        x = self.mask_downscaling[0](x)
        x = self.mask_downscaling[1](x)
        x = _gelu(x)
        x = self.mask_downscaling[2](x)
        x = self.mask_downscaling[3](x)
        x = _gelu(x)
        return self.mask_downscaling[4](x)

    def no_mask_dense(self, batch: int) -> jax.Array:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (batch, h, w, self.embed_dim)).astype(self.dtype)

    def get_dense_pe(self) -> jax.Array:
        """(1, h, w, C) dense positional encoding of the embedding grid."""
        return self.pe_layer.grid(self.image_embedding_size)[None]

    def __call__(self, coords, labels, boxes=None, masks=None,
                 pad_points=True):
        """Returns (sparse (B, N, C), dense (B, h, w, C))."""
        sparse = self.embed_points(coords, labels,
                                   pad=pad_points and boxes is None)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self.embed_boxes(boxes)], axis=1)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(coords.shape[0])
        return sparse, dense
