"""Pooling ops with torch-comparable semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool2d(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """``F.avg_pool2d(x, window)`` on trailing (H, W) dims.

    Matches torch defaults: stride = window, no padding (VALID), floor mode —
    the ALP prototype pooling (reference models/alpmodule.py:114,118) and the
    gridconv+ mode-fallback check (grid_proto_fewshot.py:254-256).
    """
    if stride is None:
        stride = window
    nd = x.ndim
    dims = (1,) * (nd - 2) + (window, window)
    strides = (1,) * (nd - 2) + (stride, stride)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, "VALID")
    return summed / (window * window)


def max_pool2d(x: jax.Array, window: int, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    """``F.max_pool2d`` on trailing (H, W) dims (used for morphology)."""
    if stride is None:
        stride = window
    nd = x.ndim
    dims = (1,) * (nd - 2) + (window, window)
    strides = (1,) * (nd - 2) + (stride, stride)
    pads = [(0, 0)] * (nd - 2) + [(padding, padding), (padding, padding)]
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, neg_inf, lax.max, dims, strides, pads)
