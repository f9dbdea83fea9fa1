"""Dynamic W8A8 int8 matmul for the encoder dense stages.

The v5e MXU executes int8×int8→int32 at ~2× the bf16 rate; the encoders'
dense stages (qkv/proj/fc1/fc2) are measured at ~97% of the bf16 peak
(ROUND_NOTES r4 marginal-cost A/Bs), so lower precision is the only
remaining lever on them — the bf16 flop ceiling for the flagship config
(45.7 slices/sec/chip, tools/roofline.py) sits BELOW the >50 BASELINE
bar.  The reference has no analog (plain fp torch matmuls,
segment_anything/modeling/image_encoder.py:17-122); this is a TPU-native
opt-in gated on measured mask drift (PARITY.md).

Scheme: symmetric dynamic quantization, zero calibration state —
per-token activation scales (amax over the contraction axis) and
per-out-channel weight scales, int32 accumulation, rank-1 dequant fused
into the epilogue:

    y = (q(x) @ q(w)) * (sx ⊗ sw) + b

Exactness notes: scales are f32; the int8 rounding error is bounded by
|x|_max/127 per element, ~2.6× the bf16 mantissa step at equal amax —
drift is measured end-to-end (tools/measure_bf16_drift.py) rather than
argued.  The f32 coarse-logit and decode tails are NOT quantized.

INFERENCE ONLY (like the fused ALP kernel): ``jnp.round`` has zero
derivative almost everywhere, so gradients through QuantDense vanish on
the activation path — no straight-through estimator is implemented.
Training and TTT keep ``quant_dense=False`` (their drivers never set it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_symmetric(x: jax.Array, axis) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization along ``axis`` (the contraction dims).

    Returns (q, scale) with q int8 in [-127, 127] and scale f32 shaped
    like x with ``axis`` reduced (keepdims): x ≈ q * scale.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def int8_dense(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
               out_dtype=jnp.bfloat16) -> jax.Array:
    """``x @ kernel + bias`` through the int8 MXU path.

    x (..., K) float; kernel (K, N); bias (N,) | None.  The int32 dot is
    the only O(M·K·N) op; quantize/dequant are bandwidth-level epilogues
    XLA fuses into the operand/output streams.
    """
    qx, sx = quantize_symmetric(x, axis=-1)            # (..., K), (..., 1)
    qw, sw = quantize_symmetric(kernel, axis=0)        # (K, N), (1, N)
    y = jax.lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (..., N) int32
    y = y.astype(jnp.float32) * sx * sw                # rank-1 dequant
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in nn.Dense with the int8 forward — IDENTICAL param tree
    (``kernel`` (K, N), ``bias`` (N,), f32), so checkpoints convert and
    load exactly as for the fp build; only the forward changes."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return int8_dense(x, kernel, bias, out_dtype=self.dtype)


def dense_cls(quant: bool):
    """Dense factory for the encoder blocks: nn.Dense, or QuantDense when
    the int8 path is enabled."""
    return QuantDense if quant else nn.Dense
