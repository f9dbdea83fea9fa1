"""Normalization helpers matching the reference ALP numerics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-4) -> jax.Array:
    """L2-normalize with the reference's epsilon clamp.

    Matches ``safe_norm`` (reference models/alpmodule.py:14-18):
    ``x / max(||x||_2, eps)`` — note the clamp is on the *norm*, not norm+eps.
    """
    n = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_similarity(x: jax.Array, y: jax.Array, axis: int = -1,
                      eps: float = 1e-4) -> jax.Array:
    """``F.cosine_similarity`` semantics: ``x·y / (max(||x||,eps)·max(||y||,eps))``.

    Used by ALP 'mask' (global-prototype) scoring
    (reference models/alpmodule.py:59).
    """
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=axis), eps)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=axis), eps)
    return dot / (nx * ny)
