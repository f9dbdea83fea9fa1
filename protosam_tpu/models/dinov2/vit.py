"""DINOv2 vision transformer in flax (frozen feature extractor).

The reference loads DINOv2 from torch.hub (reference
models/grid_proto_fewshot.py:54-72: dinov2_vitl14 / vitl14_reg / vitb14) and
consumes ``forward_features(...)["x_norm_patchtokens"]``
(grid_proto_fewshot.py:90-98).  This is a from-scratch flax implementation of
the published DINOv2 architecture: ViT with 14-px patches, cls token (+
optional register tokens), LayerScale residual scaling, pre-norm blocks, and
bicubic pos-embed interpolation for non-native grid sizes.

Weights come from the torch.hub checkpoints via
utils/torch_convert.convert_dinov2.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from protosam_tpu.ops.attention import multi_head_attention_bhsd

import functools

from protosam_tpu.models.layers import TokenLayerNorm

def _gelu(x):
    """Exact erf GELU on TPU lowers to a multi-fusion f32 erfc with
    bit-packed sign predicates (~70 ms/batch-8 across both encoders in the
    r2 device trace); the tanh approximation's max error (5e-4) is 30x
    below the bf16 quantization noise floor (1.6e-2), so the bf16
    production path uses it.  float32 -- the strict-parity dtype
    (PARITY.md) -- keeps exact erf."""
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class Attention(nn.Module):
    """MHA in flash-native (B, heads, S, D) layout: ONE 5-D transpose from
    the fused qkv projection straight into the kernel layout (the round-1
    (B, S, H, D) intermediate cost an extra transpose + per-layer pad/slice
    around the flash call — ~45 ms/batch-8 of pure data formatting)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # tokens beyond this index are sequence padding added once by the
    # transformer (see DinoVisionTransformer); None = no padding
    valid_tokens: int | None = None
    # int8 MXU path for qkv/proj (ops/quant; measured-drift-gated opt-in)
    quant_dense: bool = False
    # route attention through the plain XLA einsum path even on TPU — the
    # f32-STRICT leg of the drift/agreement harnesses runs under matmul
    # precision `highest`, whose multi-pass f32 dots blow the big packed
    # Pallas kernel's VMEM budget at DINOv2-L 672px; XLA manages memory
    # for the einsum path and honors `highest` exactly
    force_xla_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from protosam_tpu.ops.attention import masked_flash_attention_packed
        from protosam_tpu.ops.quant import dense_cls

        Dense = dense_cls(self.quant_dense)
        b, n, c = x.shape
        hd = c // self.num_heads
        scale = hd ** -0.5
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(x)  # (B, N, 3C)

        def packed_path(qkv):
            # TPU: the raw (B, S, 3C) projection feeds the kernel directly —
            # no (B, H, S, D) intermediate, no transposes (the r2 trace
            # showed ~1.2 ms/layer-batch8 of pure layout copies around the
            # heads-first layout at DINOv2-L)
            return masked_flash_attention_packed(
                qkv, scale=scale, num_heads=self.num_heads,
                n_valid=self.valid_tokens, interpret=False)

        def einsum_path(qkv):
            qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
            qkv = qkv.transpose(2, 0, 3, 1, 4)   # (3, B, H, N, D)
            out = multi_head_attention_bhsd(qkv[0], qkv[1], qkv[2],
                                            scale=scale,
                                            n_valid=self.valid_tokens,
                                            use_flash=False)
            return out.transpose(0, 2, 1, 3).reshape(b, n, c)

        if self.force_xla_attn:
            out = einsum_path(qkv)
        else:
            out = jax.lax.platform_dependent(qkv, cpu=einsum_path,
                                             default=packed_path)
        return Dense(c, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.constant(1e-5),
                           (x.shape[-1],))
        return x * gamma.astype(self.dtype)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    valid_tokens: int | None = None
    quant_dense: bool = False
    force_xla_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        from protosam_tpu.ops.quant import dense_cls

        Dense = dense_cls(self.quant_dense)
        c = x.shape[-1]
        y = TokenLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.dtype,
                      valid_tokens=self.valid_tokens,
                      quant_dense=self.quant_dense,
                      force_xla_attn=self.force_xla_attn, name="attn")(y)
        x = x + LayerScale(self.dtype, name="ls1")(y)
        y = TokenLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                  name="mlp_fc1")(y)
        y = _gelu(y)
        y = Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + LayerScale(self.dtype, name="ls2")(y), None


class DinoVisionTransformer(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    pos_embed_size: int = 37  # 518 // 14, the pretrain grid
    interpolate_antialias: bool = False
    # hub models call F.interpolate with scale_factor=(g+offset)/m instead of
    # size=(g, g) — the given factor drives the source mapping, shifting
    # every interpolated pos-embed sample (hub vision_transformer.py
    # interpolate_pos_encoding).  0.1 for the plain vit*14 checkpoints,
    # 0.0 for the _reg ones.
    interpolate_offset: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # rematerialize blocks under grad (trade FLOPs for activation memory
    # when fine-tuning the big encoders; reference uses torch grad
    # checkpointing for the same purpose, image_encoder.py:113-118)
    remat: bool = False
    # int8 MXU path for the block dense stages (ops/quant)
    quant_dense: bool = False
    # plain-XLA attention (see Attention.force_xla_attn)
    force_xla_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        """x: (B, H, W, 3), H/W divisible by patch_size.

        Returns the reference-consumed subset of forward_features:
        ``x_norm_clstoken`` (B, C), ``x_norm_patchtokens`` (B, N, C).
        """
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, 1 + self.pos_embed_size ** 2, self.embed_dim))

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (b, 1, self.embed_dim)), x], axis=1)
        x = x + self._interpolate_pos_encoding(pos_embed, gh, gw).astype(self.dtype)

        if self.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, self.num_register_tokens, self.embed_dim))
            x = jnp.concatenate(
                [x[:, :1],
                 jnp.broadcast_to(reg.astype(self.dtype),
                                  (b, self.num_register_tokens,
                                   self.embed_dim)),
                 x[:, 1:]], axis=1)

        # pad the token sequence ONCE to a flash-block multiple and mask
        # padded keys inside attention — round 1 padded/sliced around every
        # layer's flash call instead (~30 ms/batch-8 at DINOv2-L).  Small
        # (test-size) sequences skip padding entirely.
        n_tokens = x.shape[1]
        # 128-lane multiple: the masked one-pass kernel has no 512-block
        # constraint (the old stock-flash path padded to 512s — 2560 vs
        # 2432 at 672px taxed every dense matmul ~5%)
        n_pad = (-n_tokens) % 128 if n_tokens >= 2048 else 0
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

        # one traced block scanned over stacked per-layer params (compile
        # time: 1 block instead of depth blocks)
        block_cls = nn.remat(Block) if self.remat else Block
        ScannedBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
        )
        x, _ = ScannedBlocks(self.num_heads, self.mlp_ratio, self.dtype,
                             valid_tokens=n_tokens if n_pad else None,
                             quant_dense=self.quant_dense,
                             force_xla_attn=self.force_xla_attn,
                             name="blocks")(x)

        if n_pad:
            x = x[:, :n_tokens]
        # The final norm computes in f32 even under a bf16 build: its output
        # feeds the ALP cosine match whose argmax seeds CCA and every SAM
        # prompt (reference grid_proto_fewshot.py:270-273), and it is ~0.01%
        # of encoder FLOPs — the f32 coarse-logit tail (PARITY.md, r5)
        # starts here.  f32 builds are unchanged (dtype was f32 already).
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_regtokens": x[:, 1:1 + r],
            "x_norm_patchtokens": x[:, 1 + r:],
        }

    def _interpolate_pos_encoding(self, pos_embed: jax.Array, gh: int,
                                  gw: int) -> jax.Array:
        """Torch-exact bicubic interpolation of the pretrain pos-embed grid
        to (gh, gw) — hub interpolate_pos_encoding semantics: A=-0.75
        kernel (PIL a=-0.5 when antialias), and with interpolate_offset the
        scale_factor call mode where (g+offset)/m drives the mapping."""
        from protosam_tpu.ops.resize import resize_bicubic_torch

        m = self.pos_embed_size
        cls_pe = pos_embed[:, :1].astype(jnp.float32)
        patch_pe = pos_embed[:, 1:].astype(jnp.float32)
        if (gh, gw) == (m, m):
            return jnp.concatenate([cls_pe, patch_pe], axis=1)
        grid = patch_pe.reshape(1, m, m, self.embed_dim)
        grid = jnp.moveaxis(grid, -1, 1)            # NCHW for the resize
        scales = None
        if self.interpolate_offset:
            # torch coordinate scale = 1/scale_factor
            scales = (m / (gh + self.interpolate_offset),
                      m / (gw + self.interpolate_offset))
        grid = resize_bicubic_torch(grid, (gh, gw), scales=scales,
                                    antialias=self.interpolate_antialias)
        grid = jnp.moveaxis(grid, 1, -1)
        return jnp.concatenate(
            [cls_pe, grid.reshape(1, gh * gw, self.embed_dim)], axis=1)


_DINO_CONFIGS: dict[str, dict[str, Any]] = {
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16),
    "dinov2_vits14_reg": dict(embed_dim=384, depth=12, num_heads=6,
                              num_register_tokens=4,
                              interpolate_antialias=True,
                              interpolate_offset=0.0),
    "dinov2_vitb14_reg": dict(embed_dim=768, depth=12, num_heads=12,
                              num_register_tokens=4,
                              interpolate_antialias=True,
                              interpolate_offset=0.0),
    "dinov2_vitl14_reg": dict(embed_dim=1024, depth=24, num_heads=16,
                              num_register_tokens=4,
                              interpolate_antialias=True,
                              interpolate_offset=0.0),
    # test-size model for CPU-runnable configs
    "dinov2_vitt14": dict(embed_dim=64, depth=2, num_heads=2),
}


def build_dinov2(name: str, dtype=jnp.float32, quant_dense: bool = False,
                 force_xla_attn: bool = False) -> DinoVisionTransformer:
    if name not in _DINO_CONFIGS:
        raise KeyError(f"unknown DINOv2 variant {name!r}; "
                       f"have {sorted(_DINO_CONFIGS)}")
    return DinoVisionTransformer(dtype=dtype, quant_dense=quant_dense,
                                 force_xla_attn=force_xla_attn,
                                 **_DINO_CONFIGS[name])
