"""SAM image encoder (ViTDet) in flax, NHWC, fixed shapes.

Re-implements the behavior of reference
models/segment_anything/modeling/image_encoder.py (ImageEncoderViT:17-122,
Block:125-193, Attention:196-251, window partition:254-300, decomposed
relative positions:303-372, PatchEmbed:375-406) as a TPU-first design:
everything jits once at the fixed 1024² input; windowed attention runs
batched over windows; the decomposed rel-pos bias is precomputed per block
as two einsums feeding a single fused softmax.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from protosam_tpu.models.layers import LayerNorm2d, MLPBlock

_gelu = functools.partial(nn.gelu, approximate=False)


def window_partition(x: jax.Array, window: int) -> tuple[jax.Array, tuple[int, int]]:
    """[B, H, W, C] -> [B*nw, window, window, C] with zero padding."""
    b, h, w, c = x.shape
    ph, pw = (-h) % window, (-w) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, window: int, pad_hw: tuple[int, int],
                       hw: tuple[int, int]) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _interp_rel_pos(rel_pos: jax.Array, target_len: int) -> jax.Array:
    """Linear 1-D interpolation of the rel-pos table to 2*size-1 rows
    (reference image_encoder.py:315-326; align_corners=False)."""
    if rel_pos.shape[0] == target_len:
        return rel_pos
    return jax.image.resize(rel_pos, (target_len, rel_pos.shape[1]),
                            method="linear", antialias=False)


def _rel_pos_table(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """R[q, k, c] lookup table (reference get_rel_pos, image_encoder.py:303-333)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel = _interp_rel_pos(rel_pos, max_rel_dist)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[jnp.asarray(relative.astype(np.int64))]


class Attention(nn.Module):
    """Multi-head attention with decomposed relative position bias.

    Input [B, H, W, C] (a window or the full grid); shapes are static so the
    rel-pos gather tables are traced once.  Large (global) grids are
    processed in sequential query-row chunks: materializing the full
    (B, heads, 4096, 4096) f32 attention matrix of a 64×64 global block
    costs ~6 GB at batch 8 — chunking bounds peak memory at
    (B, heads, chunk·W, H·W) with identical numerics.
    """

    num_heads: int
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32
    q_chunk_rows: int = 8   # row-chunk size for grids with >= 2048 tokens

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)  # B,H,W,3C
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # each B,HW,heads,hd

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * h - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * w - 1, head_dim))
            Rh = _rel_pos_table(rel_h.astype(self.dtype), h, h)   # (h, h, hd)
            Rw = _rel_pos_table(rel_w.astype(self.dtype), w, w)   # (w, w, hd)
        else:
            Rh = Rw = None

        def attend(q_rows, Rh_rows):
            """q_rows: (B, ch, W, heads, hd); Rh_rows: (ch, h, hd)."""
            ch = q_rows.shape[1]
            qf = q_rows.reshape(b, ch * w, self.num_heads, head_dim)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qf * scale, k,
                              preferred_element_type=jnp.float32)
            if self.use_rel_pos:
                bias_h = jnp.einsum("bhwnc,hkc->bnhwk", q_rows, Rh_rows,
                                    preferred_element_type=jnp.float32)
                bias_w = jnp.einsum("bhwnc,wkc->bnhwk", q_rows, Rw,
                                    preferred_element_type=jnp.float32)
                attn = (attn.reshape(b, self.num_heads, ch, w, h, w)
                        + bias_h[..., None] + bias_w[..., None, :]
                        ).reshape(b, self.num_heads, ch * w, h * w)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                              preferred_element_type=jnp.float32
                              ).astype(self.dtype)   # (B, ch*W, heads, hd)

        rq = q.reshape(b, h, w, self.num_heads, head_dim)
        if h * w >= 2048 and h % self.q_chunk_rows == 0:
            nch = h // self.q_chunk_rows
            rq_c = rq.reshape(b, nch, self.q_chunk_rows, w, self.num_heads,
                              head_dim).transpose(1, 0, 2, 3, 4, 5)
            Rh_c = (Rh.reshape(nch, self.q_chunk_rows, h, head_dim)
                    if self.use_rel_pos else jnp.zeros((nch, 1)))
            out = jax.lax.map(lambda args: attend(*args), (rq_c, Rh_c))
            out = out.transpose(1, 0, 2, 3, 4).reshape(b, h * w, c)
        else:
            out = attend(rq, Rh).reshape(b, h * w, c)
        out = out.reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Transformer block with optional window attention (reference Block:125-193)."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    window_size: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = Attention(self.num_heads, self.use_rel_pos, self.dtype,
                      name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + MLPBlock(int(c * self.mlp_ratio), _gelu, self.dtype,
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """ViTDet encoder: 1024² -> 64×64×out_chans embedding.

    Configs per reference build_sam.py:55-107 (vit_b 768×12, vit_l 1024×24,
    vit_h 1280×32; window 14; 4 global blocks).
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] preprocessed pixels -> [B, H/16, W/16, out_chans]."""
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        n = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n, n, self.embed_dim))
        x = x + pos.astype(self.dtype)

        for i in range(self.depth):
            x = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)

        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln2")(x)
        return x
