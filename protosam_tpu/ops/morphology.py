"""Binary morphology on device (replaces cv2.dilate in prompt extraction)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp



@functools.partial(jax.jit, static_argnames=("kernel_size", "iterations"))
def dilate(mask: jax.Array, kernel_size: int = 3, iterations: int = 1) -> jax.Array:
    """``cv2.dilate(mask, ones((k,k)), iterations=n)`` for binary masks.

    Equivalent to n max-pools with a k×k window, stride 1, same padding —
    the negative-point boundary construction of reference
    models/ProtoSAM.py:395-409 uses k=3, n=10.

    mask: (..., H, W), any numeric/bool dtype; returns same dtype.
    """
    x = mask.astype(jnp.float32)
    # n iterations of a k×k square SE == one (n*(k-1)+1)² square SE, and a
    # square SE is separable into a horizontal + vertical 1-D max — two
    # reduce_windows instead of n (7x faster at n=10 on v5e).
    eff = iterations * (kernel_size - 1) + 1
    pad = eff // 2
    nd = x.ndim
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) * (nd - 2) + (eff, 1), (1,) * nd,
        [(0, 0)] * (nd - 2) + [(pad, pad), (0, 0)])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) * (nd - 2) + (1, eff), (1,) * nd,
        [(0, 0)] * (nd - 2) + [(0, 0), (pad, pad)])
    return x.astype(mask.dtype)
