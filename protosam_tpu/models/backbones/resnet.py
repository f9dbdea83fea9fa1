"""Dilated ResNet-101 (DeepLabV3 backbone) in flax.

Behavioral spec: reference models/backbone/torchvision_backbones.py:12-58 —
torchvision ``deeplabv3_resnet101``'s backbone (ResNet-101 with
``replace_stride_with_dilation=[False, True, True]``, output stride 8),
ASPP dropped, followed by a 1×1 2048→256 ``localconv`` (bias-free).

BatchNorm is frozen (running statistics), matching the reference's
eval-mode inference; episodic training of this backbone fine-tunes through
frozen-BN as well (the reference trains with batch size 1 where torch BN
batch stats are degenerate anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * w + b."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("running_mean", nn.initializers.zeros, (c,))
        var = self.param("running_var", nn.initializers.ones, (c,))
        scale = (w / jnp.sqrt(var + self.eps)).astype(self.dtype)
        shift = (b - mean * w / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * scale + shift


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class DeeplabRes101Encoder(nn.Module):
    """ResNet-101 OS-8 trunk + 1×1 localconv to 256 channels.

    Input (B, H, W, 3) -> (B, ceil(H/8), ceil(W/8), 256).
    """

    dtype: jnp.dtype = jnp.float32
    layers: tuple = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # (planes, blocks, stride, dilations): torchvision dilated scheme —
        # layer3/4 keep stride 1 and dilate instead (first block keeps the
        # previous dilation).
        specs = [
            (64, self.layers[0], 1, [1] * self.layers[0]),
            (128, self.layers[1], 2, [1] * self.layers[1]),
            (256, self.layers[2], 1, [1] + [2] * (self.layers[2] - 1)),
            (512, self.layers[3], 1, [2] + [4] * (self.layers[3] - 1)),
        ]
        in_planes = 64
        for li, (planes, blocks, stride, dils) in enumerate(specs, start=1):
            for bi in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dils[bi],
                    has_downsample=(bi == 0 and (stride != 1
                                                 or in_planes != planes * 4)),
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}")(x)
            in_planes = planes * 4

        return nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                       name="localconv")(x)
