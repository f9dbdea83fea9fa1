"""Connected-component analysis on device (XLA), replacing cv2.

The reference pipeline round-trips through the host mid-forward to run
``cv2.connectedComponentsWithStats(pred, connectivity=8)``
(util/utils.py:474-494) and then derives per-component confidence, bounding
boxes, centroids and point prompts on CPU (models/ProtoSAM.py:242-466).
Here the whole stage is jit-compatible and stays in HBM.

Algorithm: iterative min-label propagation with pointer jumping.
Every foreground pixel starts labeled with its own flat index; each step
takes the min label over the 8-neighborhood and then "jumps" through the
label array twice (``L = L[L]``), which shortcuts chains and converges in
O(log diameter) steps for typical blobs.  Converged labels are the minimum
flat index of each component — which is also the *first pixel in row-major
scan order*, i.e. exactly the order cv2 assigns component ids.  Components
are therefore relabeled 1..N in ascending root order and match cv2's
labeling bit-for-bit (for <= max_ccs components).

Shapes are static: stats are padded to ``max_ccs`` rows with a validity
mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# python int, not jnp.int32: a module-level jnp constant would allocate on
# the default device at import time
_BIG = 2**30


class ComponentStats(NamedTuple):
    """Padded per-component statistics (component 0 = background excluded).

    labels:    (H, W) int32 — 0 background, 1..N component ids (cv2 order).
    num:       () int32 — number of components found (may exceed max_ccs;
               only the first max_ccs are materialized in the stats rows).
    valid:     (K,) bool — stats row i describes component i+1.
    areas:     (K,) int32 — pixel counts.
    bboxes:    (K, 4) int32 — (min_x, min_y, max_x, max_y), inclusive, the
               XYXY convention of reference ProtoSAM.get_bbox_per_cc
               (models/ProtoSAM.py:242-264).
    centroids: (K, 2) float32 — (x, y) mean pixel coords (cv2 convention,
               used for CENTROID/BOTH point modes, ProtoSAM.py:383-389).
    """

    labels: jax.Array
    num: jax.Array
    valid: jax.Array
    areas: jax.Array
    bboxes: jax.Array
    centroids: jax.Array


def _neighbor_min(lbl: jax.Array, fg: jax.Array) -> jax.Array:
    """Min label over the 3×3 neighborhood (8-connectivity, incl. self)."""
    red = lax.reduce_window(lbl, np.int32(2**30), lax.min, (3, 3), (1, 1),
                            [(1, 1), (1, 1)])
    return jnp.where(fg, red, _BIG)


def _seg_min_scan(lbl: jax.Array, fg: jax.Array, axis: int) -> jax.Array:
    """Min label propagated along contiguous foreground runs on ``axis``
    (forward + backward segmented cummin via associative_scan — vectorized,
    no gathers; this is what makes device CCA fast on TPU)."""

    def op(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    reset = ~fg

    def run(v):
        out, _ = lax.associative_scan(op, (v, reset), axis=axis)
        return out

    fwd = run(lbl)
    bwd = jnp.flip(
        lax.associative_scan(op, (jnp.flip(lbl, axis), jnp.flip(reset, axis)),
                             axis=axis)[0], axis)
    return jnp.where(fg, jnp.minimum(fwd, bwd), _BIG)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 1024) -> jax.Array:
    """Raw root labels: (H, W) int32, BIG on background, root flat-index on fg.

    Dispatches per lowering platform: the VMEM-resident Pallas fixpoint
    kernel on TPU (ops/cca_pallas, 8.9x over the XLA scans at 1024² on
    v5e), the XLA scan implementation on CPU.  Both converge to identical
    labels (tests/test_cca_pallas.py; tools/tpu_suite.py cca_pallas).
    """

    def pallas_path(m):
        from protosam_tpu.ops.cca_pallas import label_components_pallas

        return label_components_pallas(m, interpret=False,
                                       max_iters=max_iters)

    return jax.lax.platform_dependent(
        mask,
        cpu=functools.partial(_label_components_xla, max_iters=max_iters),
        default=pallas_path)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _label_components_xla(mask: jax.Array, max_iters: int = 1024) -> jax.Array:
    """XLA implementation: per iteration an 8-neighborhood min (one 3×3
    reduce_window), then segmented min-propagation along full rows and
    columns.  A straight or convex component converges in one iteration;
    each extra iteration resolves one more "zigzag" in the geometry.
    """
    h, w = mask.shape
    fg = mask > 0
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    lbl = jnp.where(fg, idx, _BIG)
    lbl = _seg_min_scan(_neighbor_min(lbl, fg), fg, axis=1)
    lbl = _seg_min_scan(lbl, fg, axis=0)

    def body(state):
        lbl, _, it = state
        new = _neighbor_min(lbl, fg)
        new = _seg_min_scan(new, fg, axis=1)
        new = _seg_min_scan(new, fg, axis=0)
        changed = jnp.any(new != lbl)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lbl, _, _ = lax.while_loop(cond, body, (lbl, jnp.bool_(True), jnp.int32(0)))
    return lbl


@functools.partial(jax.jit, static_argnames=("max_ccs", "max_iters"))
def connected_components(mask: jax.Array, max_ccs: int = 8,
                         max_iters: int = 1024) -> ComponentStats:
    """Device-side equivalent of ``cv2.connectedComponentsWithStats`` +
    the reference's per-CC bbox/centroid extraction.

    mask: (H, W), nonzero = foreground.
    """
    h, w = mask.shape
    lbl = label_components(mask, max_iters)

    flat = lbl.reshape(-1)
    # Roots are the (few) label values that equal their own flat index.
    # Extract the first max_ccs of them in ascending order with iterative
    # masked min-reductions — sorts/gathers (jnp.unique, searchsorted) are
    # serialized on TPU and were ~100x slower here.
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    root_vals = jnp.where((flat == idx) & (flat < _BIG), flat, _BIG)
    num = jnp.sum(root_vals < _BIG).astype(jnp.int32)

    def take_min(carry, _):
        vals = carry
        m = jnp.min(vals)
        return jnp.where(vals == m, _BIG, vals), m

    _, roots = lax.scan(take_min, root_vals, None, length=max_ccs)  # (K,) asc
    # relabel 1..N in cv2 scan order (roots ascend by flat index); components
    # beyond max_ccs fall back to 0 in the label image — the true count is
    # reported separately so callers can detect overflow.
    comp_id = jnp.sum(
        ((flat[None, :] == roots[:, None]) & (roots[:, None] < _BIG))
        * jnp.arange(1, max_ccs + 1, dtype=jnp.int32)[:, None], axis=0)
    labels = comp_id.reshape(h, w).astype(jnp.int32)

    onehot = labels[None] == jnp.arange(1, max_ccs + 1, dtype=jnp.int32)[:, None, None]
    valid = onehot.any(axis=(1, 2))
    areas = onehot.sum(axis=(1, 2)).astype(jnp.int32)

    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    big_i = jnp.int32(2**30)
    min_x = jnp.min(jnp.where(onehot, xs, big_i), axis=(1, 2))
    max_x = jnp.max(jnp.where(onehot, xs, -1), axis=(1, 2))
    min_y = jnp.min(jnp.where(onehot, ys, big_i), axis=(1, 2))
    max_y = jnp.max(jnp.where(onehot, ys, -1), axis=(1, 2))
    bboxes = jnp.stack([min_x, min_y, max_x, max_y], axis=-1)

    denom = jnp.maximum(areas, 1).astype(jnp.float32)
    cx = jnp.sum(jnp.where(onehot, xs, 0), axis=(1, 2)).astype(jnp.float32) / denom
    cy = jnp.sum(jnp.where(onehot, ys, 0), axis=(1, 2)).astype(jnp.float32) / denom
    centroids = jnp.stack([cx, cy], axis=-1)

    return ComponentStats(labels, num, valid, areas, bboxes, centroids)


def component_confidences(stats: ComponentStats, fg_probs: jax.Array,
                          pred: jax.Array) -> jax.Array:
    """Per-component confidence, reference util/utils.py:485-492:
    ``sum(fg_probs * (cc == j)) / (sum(pred) + 1e-6)``.

    fg_probs: (H, W) softmax fg probability; pred: (H, W) binary prediction.
    Returns (K,) float32 (padded rows get 0).
    """
    k = stats.valid.shape[0]
    onehot = stats.labels[None] == jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None]
    num = jnp.sum(jnp.where(onehot, fg_probs[None], 0.0), axis=(1, 2))
    den = jnp.sum(pred) + 1e-6
    return jnp.where(stats.valid, num / den, 0.0)


def keep_most_confident(stats: ComponentStats, conf: jax.Array) -> jax.Array:
    """The reference's ``cca`` post-processing (util/utils.py:496-541): keep
    only the most-confident component.  Returns (H, W) binary mask (all
    zeros when no component exists or best confidence is 0).
    """
    best = jnp.argmax(conf)
    best_mask = stats.labels == (best + 1)
    any_conf = jnp.max(conf) > 0
    return jnp.where(any_conf, best_mask, False)
