"""Image resizing with PyTorch-comparable semantics.

The reference pipeline is laced with ``F.interpolate`` calls in three distinct
modes whose pixel-grid conventions differ; mask agreement with the reference is
sensitive to all of them (see reference models/ProtoSAM.py:592-594,676 and
models/segment_anything/modeling/sam.py:154-160):

* ``bilinear, align_corners=False, antialias=False`` — half-pixel source
  mapping, clamped at borders.  ``jax.image.resize(method="linear",
  antialias=False)`` implements the same convention; we wrap it.
* ``nearest`` — torch's *legacy* nearest uses the asymmetric mapping
  ``src = floor(dst * in/out)`` (NOT half-pixel rounding, which is what
  ``jax.image.resize("nearest")`` does).  Implemented here by explicit gather.
* ``bilinear, antialias=True`` — PIL-style triangle filter; matches
  ``jax.image.resize(method="linear", antialias=True)``.

All functions take NCHW (or any rank with trailing H, W) arrays and resize the
last two dims, like ``F.interpolate`` on 4-D input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _out_shape(x: jax.Array, size: tuple[int, int]) -> tuple[int, ...]:
    return (*x.shape[:-2], int(size[0]), int(size[1]))


@functools.lru_cache(maxsize=None)
def _linear_weights_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix for align_corners=False bilinear
    (half-pixel mapping ``src = (i+0.5)*in/out - 0.5``, border-clamped) —
    identical taps/weights to F.interpolate and jax.image.resize
    (antialias=False).  Without antialiasing every output pixel mixes at
    most two inputs, so the matrix is 2-banded."""
    # torch CPU computes source coords in float32 (accscalar_t=float):
    # scale = in/out, src = scale*(i+0.5) - 0.5 — replicate the rounding
    i = np.arange(out_size, dtype=np.float32)
    scale = np.float32(in_size) / np.float32(out_size)
    src = scale * (i + np.float32(0.5)) - np.float32(0.5)
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float32)
    i = np.arange(out_size)
    w = np.zeros((out_size, in_size), np.float32)
    np.add.at(w, (i, np.clip(lo, 0, in_size - 1)), 1.0 - frac)
    np.add.at(w, (i, np.clip(lo + 1, 0, in_size - 1)), frac)
    return w


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """``F.interpolate(x, size, mode='bilinear', align_corners=False)``.

    Implemented as two separable weight-matrix contractions on the MXU —
    ``jax.image.resize``'s lowering costs ~100 ms for (8, 3, 672²)→1024²
    on v5e where the equivalent matmuls cost ~1 ms."""
    if x.shape[-2:] == tuple(size):
        return x
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jax.image.resize(x, _out_shape(x, size), method="linear",
                                antialias=False)
    h_in, w_in = x.shape[-2], x.shape[-1]
    wr = jnp.asarray(_linear_weights_np(h_in, int(size[0])))
    wc = jnp.asarray(_linear_weights_np(w_in, int(size[1])))
    y = jnp.einsum("...hw,jw->...hj", x.astype(jnp.float32), wc,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...hj,ih->...ij", y, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def resize_bilinear_antialias(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """``F.interpolate(..., mode='bilinear', align_corners=False, antialias=True)``.

    Used by the SAM longest-side transform (reference
    models/segment_anything/utils/transforms.py:70-92).
    """
    if x.shape[-2:] == tuple(size):
        return x
    return jax.image.resize(x, _out_shape(x, size), method="linear", antialias=True)


def resize_bicubic_antialias(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bicubic resize with antialiasing (DINOv2 pos-embed interpolation)."""
    if x.shape[-2:] == tuple(size):
        return x
    return jax.image.resize(x, _out_shape(x, size), method="cubic", antialias=True)


@functools.lru_cache(maxsize=None)
def _bicubic_weights_np(in_size: int, out_size: int, scale: float | None = None,
                        antialias: bool = False) -> np.ndarray:
    """(out, in) interpolation matrix reproducing torch ``F.interpolate``
    bicubic exactly — including the two facts jax.image.resize gets wrong:

    * torch's non-antialiased bicubic uses the A=-0.75 cubic-convolution
      kernel (jax's "cubic" is the Keys A=-0.5 kernel), 4 border-clamped
      taps at ``src = scale*(i+0.5)-0.5``;
    * torch's antialiased bicubic is the PIL resampler: a=-0.5 kernel,
      support widened by the scale on downscale, weights renormalized
      (aten ``_upsample_bicubic2d_aa``).

    ``scale`` is torch's coordinate scale (≈ in/out).  Passing it explicitly
    reproduces the ``scale_factor=`` call mode, where the GIVEN factor (not
    out/in) drives the source mapping — DINOv2's ``interpolate_offset=0.1``
    quirk (hub vision_transformer.py interpolate_pos_encoding) rides on
    this.  None means size mode: ``scale = in/out``.
    """
    if scale is None:
        scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    w = np.zeros((out_size, in_size), np.float64)

    def cubic(x, A):
        ax = np.abs(x)
        return np.where(
            ax <= 1, ((A + 2) * ax - (A + 3)) * ax * ax + 1,
            np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * A, 0.0))

    if not antialias:
        A = -0.75
        src = scale * (i + 0.5) - 0.5
        base = np.floor(src).astype(np.int64)
        t = src - base
        rows = np.arange(out_size)
        for d, wt in ((-1, cubic(t + 1, A)), (0, cubic(t, A)),
                      (1, cubic(1 - t, A)), (2, cubic(2 - t, A))):
            np.add.at(w, (rows, np.clip(base + d, 0, in_size - 1)), wt)
    else:
        a = -0.5
        support = 2.0 * scale if scale >= 1.0 else 2.0
        invscale = 1.0 / scale if scale >= 1.0 else 1.0
        for oi in range(out_size):
            center = scale * (oi + 0.5)
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            taps = np.arange(xmin, xmax, dtype=np.float64)
            wt = cubic((taps - center + 0.5) * invscale, a)
            w[oi, xmin:xmax] = wt / wt.sum()
    return w.astype(np.float32)


def resize_bicubic_torch(x: jax.Array, size: tuple[int, int],
                         scales: tuple[float, float] | None = None,
                         antialias: bool = False) -> jax.Array:
    """Torch-exact bicubic resize of the trailing (H, W) dims as two
    weight-matrix contractions (MXU-friendly; see _bicubic_weights_np).

    ``scales`` are torch coordinate scales (in/out-like) per axis for the
    scale_factor call mode; None derives them from the sizes.
    """
    if x.shape[-2:] == tuple(size):
        return x
    h_in, w_in = x.shape[-2], x.shape[-1]
    sh, sw = scales if scales is not None else (None, None)
    wr = jnp.asarray(_bicubic_weights_np(h_in, int(size[0]), sh, antialias))
    wc = jnp.asarray(_bicubic_weights_np(w_in, int(size[1]), sw, antialias))
    y = jnp.einsum("...hw,jw->...hj", x.astype(jnp.float32), wc,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...hj,ih->...ij", y, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """``F.interpolate(x, size, mode='nearest')`` (torch legacy convention).

    torch maps output index ``i`` to source index ``floor(i * in/out)``;
    ``jax.image.resize("nearest")`` rounds half-pixel centers instead, so the
    two disagree on every non-integer scale.  The pipeline uses nearest for
    mask down/upsampling (reference grid_proto_fewshot.py:228-231,
    segment_anything/modeling/sam.py:154-160, ProtoSAM.py:676), so we
    replicate torch exactly.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = int(size[0]), int(size[1])
    if (h_in, w_in) == (h_out, w_out):
        return x
    rows = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h_in - 1)
    cols = jnp.clip(cols, 0, w_in - 1)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # integer/bool masks: keep the gather (a float matmul would be
        # inexact past 2^24)
        return x[..., rows, :][..., :, cols]
    # float path: one-hot selection matmuls.  A gather along the minor
    # (lane) dimension serializes on TPU — at (8, 1024, 1024) -> 672² it
    # costs ~100 ms; the equivalent 0/1 matmul rides the MXU and is exact
    # (each output element is 1.0 * x[src] + zeros).
    sel_r = (rows[:, None] == jnp.arange(h_in)[None, :]).astype(x.dtype)
    sel_c = (cols[:, None] == jnp.arange(w_in)[None, :]).astype(x.dtype)
    y = jnp.einsum("...hw,jw->...hj", x, sel_c,
                   preferred_element_type=x.dtype)
    return jnp.einsum("...hj,ih->...ij", y, sel_r,
                      preferred_element_type=x.dtype)


def _nearest_src_np(in_size: int, out_size: int) -> np.ndarray:
    """Torch legacy nearest source index per output index, replicating
    resize_nearest's arithmetic EXACTLY: jax canonicalizes the python-float
    scale to f32 and multiplies in f32, so near-integer products can floor
    differently than f64 math — the map must use the same f32 ops."""
    src = np.floor(np.arange(out_size, dtype=np.float32)
                   * np.float32(in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def resize_bilinear_then_nearest(x: jax.Array, mid: tuple[int, int],
                                 size: tuple[int, int]) -> jax.Array:
    """``resize_nearest(resize_bilinear(x, mid), size)`` without materializing
    the ``mid``-sized intermediate.

    Nearest resampling is a pure row/column selection, so the composition is
    the bilinear weight matrix with its output rows selected at the nearest
    source indices — the surviving output elements are the same taps with the
    same weights.  Results match the two-step form to ~1 ulp (the backend's
    dot FMA/reassociation strategy varies with the output width; pinned by
    tests/test_ops_resize_pool.py).  The pipeline's decode tail upsamples
    SAM's 256² low-res masks to the 1024² SAM frame and immediately
    nearest-resizes to the query frame (reference ProtoSAM.py:669-678
    semantics); composing skips the (B, K, 1024, 1024) f32 round-trip
    through HBM.
    """
    if tuple(mid) == tuple(size):
        return resize_bilinear(x, size)
    h_in, w_in = x.shape[-2], x.shape[-1]
    wr = jnp.asarray(_linear_weights_np(h_in, int(mid[0]))[
        _nearest_src_np(int(mid[0]), int(size[0]))])
    wc = jnp.asarray(_linear_weights_np(w_in, int(mid[1]))[
        _nearest_src_np(int(mid[1]), int(size[1]))])
    y = jnp.einsum("...hw,jw->...hj", x.astype(jnp.float32), wc,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...hj,ih->...ij", y, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("size", "mode"))
def resize(x: jax.Array, size: tuple[int, int], mode: str = "bilinear") -> jax.Array:
    """Dispatching convenience wrapper."""
    if mode == "bilinear":
        return resize_bilinear(x, size)
    if mode == "nearest":
        return resize_nearest(x, size)
    if mode == "bilinear_antialias":
        return resize_bilinear_antialias(x, size)
    if mode == "bicubic_antialias":
        return resize_bicubic_antialias(x, size)
    raise ValueError(f"unknown resize mode: {mode}")


def longest_side_size(h: int, w: int, target_length: int) -> tuple[int, int]:
    """Output size for a longest-side resize (reference
    segment_anything/utils/transforms.py:141-148: ``int(dim * scale + 0.5)``)."""
    scale = target_length / max(h, w)
    return (int(h * scale + 0.5), int(w * scale + 0.5))
