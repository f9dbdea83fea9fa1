"""Realistic synthetic parameter trees for benchmarks and compile checks.

The benchmark drivers materialize params from ``jax.eval_shape`` with a
host-side numpy fill (a device/CPU init forward of DINOv2-L costs tens of
minutes — see ROUND_NOTES.md).  Filling EVERY leaf with N(0, 0.02²) makes
normalization scales ~0, which degenerates activations and coarse logits
and lets the data-dependent stages (CCA fixpoint, prompt top-k, the
empty-pred fallback) take unrepresentatively cheap paths.  Here leaves are
filled by role so benchmark control flow matches a real checkpoint:

  * ``scale`` / ``gamma`` (LayerNorm / LayerScale)  -> 1 + 0.02·N(0,1)
  * ``bias``                                        -> 0
  * everything else (kernels, embeddings, tokens)   -> 0.02·N(0,1)
"""

from __future__ import annotations

import jax
import numpy as np

_SCALE_NAMES = ("scale", "gamma", "weight_g")


def synthetic_params(shapes, seed: int = 0):
    """Map an ``eval_shape`` tree of ShapeDtypeStructs to filled jnp arrays."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = ""
        for p in reversed(path):
            key = getattr(p, "key", None) or getattr(p, "name", None)
            if key is not None:
                name = str(key)
                break
        noise = rng.standard_normal(s.shape, np.float32)
        if name in _SCALE_NAMES:
            vals = 1.0 + 0.02 * noise
        elif name == "bias":
            vals = np.zeros(s.shape, np.float32)
        else:
            vals = 0.02 * noise
        return jnp.asarray(vals, s.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
