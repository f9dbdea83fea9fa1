"""Normalization helpers matching the reference ALP numerics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_norm(x: jax.Array, axis: int = -1, eps: float = 1e-4,
                 keepdims: bool = False) -> jax.Array:
    """max(||x||_2, eps), computed as sqrt(max(sum x², eps²)).

    Forward-identical to the reference clamp, but with a well-defined zero
    gradient at x == 0 (jnp.linalg.norm's gradient is NaN there, which an
    all-background support mask would propagate into training).
    """
    n2 = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(n2, eps * eps))


def safe_l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-4) -> jax.Array:
    """L2-normalize with the reference's epsilon clamp.

    Matches ``safe_norm`` (reference models/alpmodule.py:14-18):
    ``x / max(||x||_2, eps)`` — note the clamp is on the *norm*, not norm+eps.
    """
    return x / clamped_norm(x, axis=axis, eps=eps, keepdims=True)


def cosine_similarity(x: jax.Array, y: jax.Array, axis: int = -1,
                      eps: float = 1e-4) -> jax.Array:
    """``F.cosine_similarity`` semantics: ``x·y / (max(||x||,eps)·max(||y||,eps))``.

    Used by ALP 'mask' (global-prototype) scoring
    (reference models/alpmodule.py:59).
    """
    dot = jnp.sum(x * y, axis=axis)
    return dot / (clamped_norm(x, axis=axis) * clamped_norm(y, axis=axis))
