"""ALP (Adaptive Local Prototype) pooling + matching — static-shape JAX.

Re-design of the reference ``MultiProtoAsConv`` (models/alpmodule.py:21-198)
for XLA: the reference *gathers* the pooled grid cells whose pooled mask
exceeds a threshold (``protos = n_sup_x[sup_y_g > thresh]``, alpmodule.py:131)
— a dynamic shape.  Here we keep **every** pooled cell and carry a validity
mask instead; invalid cells are excluded from the softmax-weighted
aggregation by masking their logits to -1e10.  Because the softmax weight of
a masked cell underflows to exactly 0 (and the weighted term is zeroed
explicitly), the result is bit-comparable to the reference's gather.

Modes (names follow the reference):
  * ``mask``       — one global masked-average prototype per shot; cosine
                     similarity ×20, max over shots (alpmodule.py:58-65,98-106).
  * ``gridconv``   — local grid prototypes only (alpmodule.py:67-77,108-132).
  * ``gridconv+``  — grid prototypes + per-shot global prototypes
                     (alpmodule.py:79-91,134-158).

All functions are jit-friendly: shapes depend only on the static
(S, C, H, W, window) configuration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from protosam_tpu.ops.norm import safe_l2_normalize
from protosam_tpu.ops.pooling import avg_pool2d

NEG_INF = -1e10
SIM_SCALE = 20.0


class Prototypes(NamedTuple):
    """Static-shape prototype set.

    protos: (P, C) prototype vectors (unnormalized).
    valid:  (P,) bool — which rows participate in matching.
    """

    protos: jax.Array
    valid: jax.Array


def grid_prototypes(sup_fts: jax.Array, sup_mask: jax.Array, window: int,
                    thresh: float) -> Prototypes:
    """Pool support features & mask into a fixed grid of local prototypes.

    sup_fts: (S, C, H, W); sup_mask: (S, 1, H, W).
    Matches reference alpmodule.py:108-132: avg-pool both with ``window``,
    keep cells where pooled mask > thresh (strict).
    Returns P = S * (H//window) * (W//window) rows, row-major per shot —
    the same enumeration order as the reference's boolean gather.
    """
    s, c = sup_fts.shape[0], sup_fts.shape[1]
    pooled = avg_pool2d(sup_fts, window)            # (S, C, h, w)
    pooled_mask = avg_pool2d(sup_mask, window)      # (S, 1, h, w)
    protos = pooled.reshape(s, c, -1).transpose(0, 2, 1).reshape(-1, c)  # (P, C)
    valid = (pooled_mask.reshape(-1) > thresh)
    return Prototypes(protos, valid)


def global_prototypes(sup_fts: jax.Array, sup_mask: jax.Array) -> jax.Array:
    """Per-shot masked-average prototype: sum(x*y)/(sum(y)+1e-5) -> (S, C).

    Matches reference alpmodule.py:98-100 / 155-156.
    """
    num = jnp.sum(sup_fts * sup_mask, axis=(-1, -2))      # (S, C)
    den = jnp.sum(sup_mask, axis=(-1, -2)) + 1e-5         # (S, 1)
    return num / den


def score_prototypes(qry_fts: jax.Array, protos: Prototypes,
                     use_fused: bool = False) -> jax.Array:
    """Softmax-weighted cosine aggregation over valid prototypes.

    qry_fts: (N, C, H, W).  Returns (N, 1, H, W) raw score.
    Matches reference alpmodule.py:67-77: normalize query per-pixel and
    prototypes per-row (safe_norm, eps 1e-4), dists = <q, p> * 20, then
    ``sum(softmax(dists, proto_axis) * dists)``.

    use_fused routes through the Pallas kernel (ops/alp_pallas) — inference
    only (no VJP); numerically identical.
    """
    if use_fused:
        from protosam_tpu.ops.alp_pallas import alp_match_fused

        return alp_match_fused(qry_fts, protos.protos, protos.valid)
    qn = safe_l2_normalize(qry_fts, axis=1)               # (N, C, H, W)
    pn = safe_l2_normalize(protos.protos, axis=1)         # (P, C)
    dists = SIM_SCALE * jnp.einsum(
        "nchw,pc->nphw", qn, pn, preferred_element_type=jnp.float32)
    valid = protos.valid[None, :, None, None]
    masked = jnp.where(valid, dists, NEG_INF)
    w = jax.nn.softmax(masked, axis=1)
    # Zero the dists (not just the weights) for invalid rows so that the
    # all-invalid edge case yields exactly 0 — the reference's empty-conv
    # result (sum over an empty dim) is also 0.
    pred = jnp.sum(w * jnp.where(valid, dists, 0.0), axis=1, keepdims=True)
    return pred


def score_global(qry_fts: jax.Array, glb_protos: jax.Array) -> jax.Array:
    """'mask'-mode score: cosine similarity ×20 vs each shot's global
    prototype, max over shots.  Matches reference alpmodule.py:58-65.

    qry_fts: (N, C, H, W); glb_protos: (S, C).  Returns (N, 1, H, W).
    """
    from protosam_tpu.ops.norm import clamped_norm

    dot = jnp.einsum("nchw,sc->nshw", qry_fts, glb_protos,
                     preferred_element_type=jnp.float32)
    qn = clamped_norm(qry_fts, axis=1)                    # (N, H, W)
    pnorm = clamped_norm(glb_protos, axis=1)              # (S,)
    cos = dot / (qn[:, None] * pnorm[None, :, None, None])
    return SIM_SCALE * jnp.max(cos, axis=1, keepdims=True)


def alp_score(qry_fts: jax.Array, sup_fts: jax.Array, sup_mask: jax.Array,
              mode: str, window: int, thresh: float,
              use_fused: bool = False) -> jax.Array:
    """Full ALP forward for one (query, support-set) pair.

    qry_fts: (N, C, H, W); sup_fts: (S, C, H, W); sup_mask: (S, 1, H, W).
    ``mode`` in {'mask', 'gridconv', 'gridconv+'} — reference
    alpmodule.py:161-198.  Returns (N, 1, H, W) raw score.
    """
    if mode == "mask":
        return score_global(qry_fts, global_prototypes(sup_fts, sup_mask))
    if mode == "gridconv":
        return score_prototypes(qry_fts, grid_prototypes(sup_fts, sup_mask,
                                                         window, thresh),
                                use_fused)
    if mode == "gridconv+":
        grid = grid_prototypes(sup_fts, sup_mask, window, thresh)
        glb = global_prototypes(sup_fts, sup_mask)               # (S, C)
        protos = jnp.concatenate([grid.protos, glb], axis=0)
        valid = jnp.concatenate(
            [grid.valid, jnp.ones(glb.shape[0], dtype=bool)], axis=0)
        return score_prototypes(qry_fts, Prototypes(protos, valid),
                                use_fused)
    raise ValueError(f"unknown ALP mode: {mode}")


def fg_score_with_fallback(qry_fts: jax.Array, sup_fts: jax.Array,
                           sup_mask: jax.Array, *, window: int,
                           fallback_window: int, thresh: float,
                           use_fused: bool = False) -> jax.Array:
    """FG scoring with the reference's data-dependent mode fallback.

    The reference switches 'gridconv+' -> 'mask' when no pooled cell of the
    *training-time* window clears the threshold
    (grid_proto_fewshot.py:254-256, checked with avg_pool2d(msk, kernel_size)
    .max() >= FG_THRESH).  Data-dependent control flow is a blend here via
    ``lax.cond`` so the jitted program stays static.
    """
    pooled_max = jnp.max(avg_pool2d(sup_mask, fallback_window))
    use_grid = pooled_max >= thresh
    return jax.lax.cond(
        use_grid,
        lambda q: alp_score(q, sup_fts, sup_mask, "gridconv+", window,
                            thresh, use_fused),
        lambda q: alp_score(q, sup_fts, sup_mask, "mask", window, thresh),
        qry_fts,
    )
