"""SAM two-way (token<->image) transformer in flax.

Behavioral spec: reference models/segment_anything/modeling/transformer.py
(TwoWayTransformer:16-107, TwoWayAttentionBlock:109-183, Attention:185-240).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from protosam_tpu.models.layers import MLPBlock


class Attention(nn.Module):
    """Projected multi-head attention with optional channel downsampling."""

    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        c = q.shape[-1]
        internal = c // self.downsample_rate
        hd = internal // self.num_heads

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, hd)

        qp = split(nn.Dense(internal, dtype=self.dtype, name="q_proj")(q))
        kp = split(nn.Dense(internal, dtype=self.dtype, name="k_proj")(k))
        vp = split(nn.Dense(internal, dtype=self.dtype, name="v_proj")(v))

        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                          preferred_element_type=jnp.float32) / (hd ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(q.shape[0], q.shape[1], internal)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = queries + 0 * queries  # keep residual form explicit
            queries = Attention(self.num_heads, dtype=self.dtype,
                                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(self.num_heads, dtype=self.dtype,
                                          name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, nn.relu, self.dtype,
                                     name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding: jax.Array, image_pe: jax.Array,
                 point_embedding: jax.Array):
        """image_embedding/pe: (B, h, w, C); point_embedding: (B, N, C).
        Returns (queries (B, N, C), keys (B, hw, C))."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)

        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.num_heads, self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm_final_attn")(queries)
        return queries, keys
