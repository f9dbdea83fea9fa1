"""Device-side SAM prompt extraction from a coarse mask.

Replaces the reference's CPU loop over connected components
(models/ProtoSAM.py:266-466): per-component top-confidence points,
centroids, bounding boxes and dilation-boundary negative points, all with
static shapes padded to (max_ccs, ...) and validity masks so the SAM
decoder can run batched over components.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from protosam_tpu.ops.cca import ComponentStats
from protosam_tpu.ops.morphology import dilate

NEG_INF = -jnp.inf


class PointPrompts(NamedTuple):
    """Padded point prompts for a batch of components.

    coords: (K, P, 2) float32 xy; labels: (K, P) int32 (1 fg / 0 bg / -1 pad);
    valid mirrors labels >= 0.
    """

    coords: jax.Array
    labels: jax.Array
    valid: jax.Array


def topk_points(prob: jax.Array, region: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k most confident points of ``prob`` inside binary ``region``.

    Matches reference ``get_most_conf_points`` (models/ProtoSAM.py:266-289):
    returns xy coords (k, 2) float32 and confidences (k,).  If the region has
    fewer than k pixels the extra rows repeat the best masked value's pixel
    ordering of jax top_k (ties by lowest flat index, i.e. row-major — the
    same tie order torch.topk produces on the masked flat array).
    """
    h, w = prob.shape
    flat = jnp.where(region.reshape(-1) > 0, prob.reshape(-1), NEG_INF)

    # k is tiny (1-4): iterative masked argmax beats lax.top_k's full sort
    # on TPU by orders of magnitude.  argmax ties break at the lowest flat
    # index (row-major) — the same tie order torch.topk yields on the
    # masked flat array.
    def take_max(vals, _):
        i = jnp.argmax(vals)
        return vals.at[i].set(NEG_INF), (vals[i], i)

    _, (conf, idx) = jax.lax.scan(take_max, flat, None, length=k)
    xy = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], axis=-1)
    return xy, conf


def component_points(fg_prob: jax.Array, stats: ComponentStats,
                     num_points: int, point_mode: str) -> PointPrompts:
    """Positive point prompts per component.

    point_mode: 'conf' (top-k confident), 'centroid', or 'both'
    (reference POINT_MODES, models/ProtoSAM.py:17-20, 381-392).
    """
    k = stats.valid.shape[0]
    onehot = stats.labels[None] == jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]

    def per_cc(cc_mask):
        return topk_points(fg_prob, cc_mask, num_points)

    conf_xy, conf_c = jax.vmap(per_cc)(onehot)  # (K, P, 2), (K, P)

    cent_xy = stats.centroids[:, None, :]  # (K, 1, 2)

    if point_mode == "conf":
        coords = conf_xy
    elif point_mode == "centroid":
        coords = cent_xy
    elif point_mode == "both":
        coords = jnp.concatenate([conf_xy, cent_xy], axis=1)
    else:
        raise ValueError(f"unknown point_mode: {point_mode}")

    p = coords.shape[1]
    labels = jnp.where(stats.valid[:, None], jnp.ones((k, p), jnp.int32),
                       -jnp.ones((k, p), jnp.int32))
    return PointPrompts(coords, labels, labels >= 0)


def negative_points(bg_prob: jax.Array, stats: ComponentStats,
                    num_neg: int = 1, kernel_size: int = 3,
                    dilation_iterations: int = 10) -> PointPrompts:
    """Per-component negative points on the dilation boundary + one global
    background point.

    Reference models/ProtoSAM.py:361-366 (global: bg prob thresholded at
    0.95, top-1) and :395-434 (per-CC: dilate the component 10× with a 3×3
    kernel, subtract, take the most confident bg point on that ring).
    Returns (K, num_neg + 1, 2) with label 0 rows where valid.
    """
    k = stats.valid.shape[0]
    onehot = (stats.labels[None] ==
              jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]).astype(jnp.float32)

    boundary = dilate(onehot, kernel_size, dilation_iterations) - onehot  # (K, H, W)

    def per_cc(ring):
        return topk_points(bg_prob, ring, num_neg)

    ring_xy, ring_c = jax.vmap(per_cc)(boundary)

    glob_prob = jnp.where(bg_prob >= 0.95, bg_prob, 0.0)
    glob_xy, glob_c = topk_points(glob_prob, (glob_prob > 0).astype(jnp.float32), 1)
    glob_valid = jnp.isfinite(glob_c[0])
    glob_xy = jnp.broadcast_to(glob_xy[None], (k, 1, 2))

    coords = jnp.concatenate([ring_xy, glob_xy], axis=1)  # (K, num_neg+1, 2)
    ring_valid = jnp.isfinite(ring_c) & stats.valid[:, None]
    valid = jnp.concatenate(
        [ring_valid, jnp.broadcast_to(glob_valid & stats.valid[:, None],
                                      (k, 1))], axis=1)
    labels = jnp.where(valid, 0, -1).astype(jnp.int32)
    # replace -inf coords (empty rings) with 0 so downstream math stays finite
    coords = jnp.where(valid[..., None], coords, 0.0)
    return PointPrompts(coords, labels, valid)


@functools.partial(jax.jit, static_argnames=("num_points", "point_mode",
                                             "use_neg_points"))
def build_sam_prompts(fg_prob: jax.Array, bg_prob: jax.Array,
                      stats: ComponentStats, *, num_points: int = 1,
                      point_mode: str = "both",
                      use_neg_points: bool = False) -> PointPrompts:
    """Assemble the full padded point set per component (pos [+ neg])."""
    pos = component_points(fg_prob, stats, num_points, point_mode)
    if not use_neg_points:
        return pos
    neg = negative_points(bg_prob, stats)
    coords = jnp.concatenate([pos.coords, neg.coords], axis=1)
    labels = jnp.concatenate([pos.labels, neg.labels], axis=1)
    valid = jnp.concatenate([pos.valid, neg.valid], axis=1)
    return PointPrompts(coords, labels, valid)
