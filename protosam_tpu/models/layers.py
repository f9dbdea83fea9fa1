"""Shared flax building blocks.

Activations are NHWC throughout (TPU-native layout); the torch reference is
NCHW — the weight converter (utils/torch_convert.py) handles the kernel
transposes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC's last axis with biased variance, eps 1e-6.

    Semantics of reference segment_anything/modeling/common.py:29-43 (which
    normalizes the channel dim of NCHW).
    """

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


class TokenLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm over the last axis, Pallas-backed on TPU.

    Identical param tree (scale/bias, f32) and numerics to nn.LayerNorm;
    exists to pin the transformer residual stream to the natural {2,1,0}
    layout — XLA otherwise transposes the whole stream to keep LN off
    lane-reductions, halving fc2/proj matmul rates (see
    ops/norm.layer_norm_tokens).
    """

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from protosam_tpu.ops.norm import layer_norm_tokens

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_tokens(x, scale, bias, epsilon=self.epsilon,
                                 out_dtype=self.dtype)


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (reference common.py:13-26).

    ``fuse_tpu=True`` routes the bf16 inference path through the fused
    Pallas MLP kernel (ops/mlp_pallas: both dots + tanh GELU + residual in
    one VMEM-resident program — built for the c=1280 SAM vit_h widths where
    XLA's conv emitter runs these dots at ~50-65% MXU).  The param tree is
    identical either way (lin1/lin2 Dense), so checkpoints are unaffected;
    CPU and non-bf16 runs keep the Dense composition.
    """

    mlp_dim: int
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    # int8 MXU path for lin1/lin2 (ops/quant; same param tree)
    quant_dense: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array | None = None,
                 fuse_tpu: bool = False) -> jax.Array:
        from protosam_tpu.ops.quant import dense_cls

        Dense = dense_cls(self.quant_dense)
        d = x.shape[-1]
        lin1 = Dense(self.mlp_dim, dtype=self.dtype, name="lin1")
        lin2 = Dense(d, dtype=self.dtype, name="lin2")
        if (fuse_tpu and self.dtype == jnp.bfloat16 and x.ndim == 2
                and not self.quant_dense):
            from protosam_tpu.ops.mlp_pallas import mlp_fused

            # bind the Dense params without paying their compute (the
            # zero-row call is dead code under the fused branch and XLA
            # removes it), then hand the cast weights to the kernel
            _ = lin2(self.act(lin1(jnp.zeros((1, d), x.dtype))))
            p1 = lin1.variables["params"]
            p2 = lin2.variables["params"]
            cast = lambda a: a.astype(self.dtype)

            # NOTE: the kernel hard-codes the tanh GELU — callers must only
            # set fuse_tpu when ``act`` is the bf16 tanh approximation
            # (models/sam/image_encoder._gelu), which is the only user.
            def fused(x, *res):
                return mlp_fused(x, cast(p1["kernel"]), cast(p1["bias"]),
                                 cast(p2["kernel"]), cast(p2["bias"]),
                                 residual=res[0] if res else None)

            def unfused(x, *res):
                y = lin2(self.act(lin1(x)))
                return res[0] + y if res else y

            ops = (x,) if residual is None else (x, residual)
            return jax.lax.platform_dependent(
                *ops, cpu=unfused, default=fused)
        y = lin2(self.act(lin1(x)))
        return y if residual is None else residual + y


class MLP(nn.Module):
    """The decoder's relu-MLP head (reference mask_decoder.py:154-176)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
