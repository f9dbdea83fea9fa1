"""Rotation test-time-augmentation helpers.

Behavioral spec: reference util/utils.py:40-83 (rotate_tensor_no_crop /
reverse_tensor built on torchvision F.rotate + antialias resize).  The
flagship eval path always calls with ``degrees_rotate=0`` (a no-op,
validation_protosam.py:388); for the TTA modes we implement center rotation
with canvas expansion via inverse-mapped bilinear/nearest sampling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from protosam_tpu.ops.resize import resize_bilinear_antialias


def _expanded_size(h: int, w: int, degrees: float) -> tuple[int, int]:
    """Canvas size after expand=True rotation (torchvision corner-extent)."""
    t = math.radians(degrees)
    c, s = abs(math.cos(t)), abs(math.sin(t))
    return (int(math.ceil(h * c + w * s)), int(math.ceil(h * s + w * c)))


def rotate_expand(x: jax.Array, degrees: float, mode: str = "bilinear"
                  ) -> jax.Array:
    """Rotate (B, C, H, W) counterclockwise by ``degrees`` with an expanded
    canvas (zero fill)."""
    b, c, h, w = x.shape
    oh, ow = _expanded_size(h, w, degrees)
    t = math.radians(degrees)
    cos, sin = math.cos(t), math.sin(t)

    yy = jnp.arange(oh, dtype=jnp.float32) - (oh - 1) / 2.0
    xx = jnp.arange(ow, dtype=jnp.float32) - (ow - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    # inverse rotation into source coordinates
    sx = cos * gx - sin * gy + (w - 1) / 2.0
    sy = sin * gx + cos * gy + (h - 1) / 2.0

    if mode == "nearest":
        ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        out = x[:, :, iy, ix]
    else:
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(sx - x0, 0.0, 1.0)
        fy = jnp.clip(sy - y0, 0.0, 1.0)
        out = (x[:, :, y0, x0] * (1 - fx) * (1 - fy)
               + x[:, :, y0, x1] * fx * (1 - fy)
               + x[:, :, y1, x0] * (1 - fx) * fy
               + x[:, :, y1, x1] * fx * fy)
    inside = ((sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5))
    return jnp.where(inside[None, None], out, 0.0)


def rotate_tensor_no_crop(image: jax.Array, degrees: float
                          ) -> tuple[jax.Array, tuple[int, int]]:
    """Reference util/utils.py:67-83: rotate with expand, then antialias
    resize back to the input size (nearest interpolation for 1-channel)."""
    if degrees == 0:
        return image, image.shape[-2:]
    b, c, h, w = image.shape
    mode = "nearest" if c == 1 else "bilinear"
    rot = rotate_expand(image, degrees, mode)
    if mode == "nearest":
        from protosam_tpu.ops.resize import resize_nearest

        resized = resize_nearest(rot, (h, w))
    else:
        resized = resize_bilinear_antialias(rot, (h, w))
    return resized, rot.shape[-2:]


def reverse_tensor(tensor: jax.Array, original_h: int, original_w: int,
                   degrees: float) -> jax.Array:
    """Reference util/utils.py:40-59: undo rotate_tensor_no_crop — resize to
    the expanded canvas, rotate back (no expand == rotate then center-crop),
    and crop the rotation padding."""
    b, c, h, w = tensor.shape
    if tensor.shape[-2:] != (original_h, original_w):
        tensor = resize_bilinear_antialias(tensor, (original_h, original_w))
    rot = rotate_no_expand(tensor, degrees)
    # crop the rotation padding (reference quirk: an odd size difference
    # leaves a one-pixel mismatch, exactly as F.rotate+slice does)
    h_rm = abs(h - original_h) // 2
    w_rm = abs(w - original_w) // 2
    if h_rm > 0 and w_rm > 0:
        rot = rot[:, :, h_rm:-h_rm, w_rm:-w_rm]
    return rot


def rotate_no_expand(x: jax.Array, degrees: float) -> jax.Array:
    """Center rotation keeping the canvas (torchvision expand=False)."""
    b, c, h, w = x.shape
    t = math.radians(degrees)
    cos, sin = math.cos(t), math.sin(t)
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    sx = cos * gx - sin * gy + (w - 1) / 2.0
    sy = sin * gx + cos * gy + (h - 1) / 2.0
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    out = (x[:, :, y0, x0] * (1 - fx) * (1 - fy)
           + x[:, :, y0, x1] * fx * (1 - fy)
           + x[:, :, y1, x0] * (1 - fx) * fy
           + x[:, :, y1, x1] * fx * fy)
    inside = ((sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5))
    return jnp.where(inside[None, None], out, 0.0)
