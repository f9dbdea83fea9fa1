"""Automatic mask generation (reference segment_anything/automatic_mask_generator.py
+ utils/amg.py), TPU-style.

A fixed 32×32 point grid is decoded *batched* through the mask decoder
(multimask), then filtered by predicted IoU and stability score, deduplicated
with box NMS — all static-shape device math except the final host-side
compaction.  Crop layers beyond the full image (crop_n_layers=0, the
SamWrapper default) are not generated.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from protosam_tpu.ops.resize import resize_bilinear


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced [0,1]² grid (reference utils/amg.py:179-187)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (N, 2) xy


def stability_score(mask_logits: jax.Array, mask_threshold: float,
                    offset: float) -> jax.Array:
    """IoU between masks thresholded at ±offset
    (reference utils/amg.py:156-176)."""
    high = jnp.sum(mask_logits > mask_threshold + offset, axis=(-1, -2))
    low = jnp.sum(mask_logits > mask_threshold - offset, axis=(-1, -2))
    return high / jnp.maximum(low, 1)


def mask_to_box(mask: jax.Array) -> jax.Array:
    """XYXY box of a binary mask; zeros for empty
    (reference batched_mask_to_box, utils/amg.py:303-346)."""
    h, w = mask.shape[-2:]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    big = jnp.int32(1 << 30)
    any_fg = mask.any(axis=(-1, -2))
    min_x = jnp.min(jnp.where(mask, xs, big), axis=(-1, -2))
    max_x = jnp.max(jnp.where(mask, xs, -1), axis=(-1, -2))
    min_y = jnp.min(jnp.where(mask, ys, big), axis=(-1, -2))
    max_y = jnp.max(jnp.where(mask, ys, -1), axis=(-1, -2))
    box = jnp.stack([min_x, min_y, max_x, max_y], axis=-1)
    return jnp.where(any_fg[..., None], box, 0)


def box_iou(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of XYXY boxes (N, 4) -> (N, N)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def nms_keep(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
             iou_thresh: float) -> jax.Array:
    """Greedy box NMS, static shape: returns a keep mask.

    Equivalent to torchvision.ops.nms over the valid entries (reference
    automatic_mask_generator.py:302-311 uses batched_nms with one category).
    """
    n = boxes.shape[0]
    iou = box_iou(boxes)
    order_scores = jnp.where(valid, scores, -jnp.inf)

    def body(i, state):
        keep, suppressed = state
        # next highest-scoring unsuppressed candidate
        cand_scores = jnp.where(suppressed, -jnp.inf, order_scores)
        j = jnp.argmax(cand_scores)
        ok = cand_scores[j] > -jnp.inf
        keep = keep.at[j].set(keep[j] | ok)
        overl = (iou[j] > iou_thresh) & ok
        suppressed = suppressed | overl | (jnp.arange(n) == j)
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros(n, bool), ~valid))
    return keep


class SamAutomaticMaskGenerator:
    """Grid-prompted whole-image segmentation (reference
    automatic_mask_generator.py:35-380 with crop_n_layers=0)."""

    def __init__(self, sam_model, sam_params, *, points_per_side: int = 32,
                 points_per_batch: int = 64, pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, mask_threshold: float = 0.0):
        self.sam = sam_model
        self.params = sam_params
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.mask_threshold = mask_threshold
        self._grid = build_point_grid(points_per_side)

    @functools.cached_property
    def _decode_batch(self):
        def fn(params, emb, coords):
            labels = jnp.ones(coords.shape[:2], jnp.int32)
            low_res, iou = self.sam.apply(
                {"params": params}, emb, coords, labels, None, None, True,
                True, method=self.sam.decode)
            m, c = low_res.shape[1], low_res.shape[0]
            masks = low_res.reshape(c * m, *low_res.shape[-2:])
            ious = iou.reshape(-1)
            stab = stability_score(masks, self.mask_threshold,
                                   self.stability_score_offset)
            boxes = mask_to_box(masks > self.mask_threshold)
            areas = jnp.sum(masks > self.mask_threshold, axis=(-1, -2))
            return masks, ious, stab, boxes, areas

        return jax.jit(fn)

    def generate(self, image_embedding, original_size: tuple[int, int],
                 image_size: int = 1024) -> list[dict[str, Any]]:
        """image_embedding: (1, 64, 64, 256) from sam.encode_image.

        Returns a list of {'segmentation' (H, W) bool, 'area',
        'predicted_iou', 'stability_score', 'bbox' XYWH} dicts sorted by
        area, like the reference's output records.
        """
        coords_all = jnp.asarray(self._grid * image_size, jnp.float32)
        n = coords_all.shape[0]
        masks, ious, stabs, boxes, areas = [], [], [], [], []
        for i in range(0, n, self.points_per_batch):
            chunk = coords_all[i:i + self.points_per_batch][:, None, :]
            m, io, st, bx, ar = self._decode_batch(self.params,
                                                   image_embedding, chunk)
            keepable = (io > self.pred_iou_thresh) & \
                (st > self.stability_score_thresh)
            idx = np.nonzero(np.asarray(keepable))[0]
            masks.append(np.asarray(m)[idx])
            ious.append(np.asarray(io)[idx])
            stabs.append(np.asarray(st)[idx])
            boxes.append(np.asarray(bx)[idx])
            areas.append(np.asarray(ar)[idx])
        masks = np.concatenate(masks)
        ious = np.concatenate(ious)
        stabs = np.concatenate(stabs)
        boxes = np.concatenate(boxes).astype(np.float32)
        areas = np.concatenate(areas)
        if masks.shape[0] == 0:
            return []

        keep = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(ious),
                                   jnp.ones(len(boxes), bool),
                                   self.box_nms_thresh))
        masks, ious, stabs, boxes, areas = (masks[keep], ious[keep],
                                            stabs[keep], boxes[keep],
                                            areas[keep])

        # upscale kept low-res masks to the original frame: bilinear to the
        # square encoder frame, crop the pad, bilinear to original
        # (upstream postprocess_masks semantics)
        from protosam_tpu.ops.resize import longest_side_size

        ih, iw = longest_side_size(original_size[0], original_size[1],
                                   image_size)
        up = np.asarray(
            resize_bilinear(jnp.asarray(masks)[:, None],
                            (image_size, image_size))[:, 0])
        up = up[..., :ih, :iw]
        up = np.asarray(resize_bilinear(jnp.asarray(up)[:, None],
                                        original_size)[:, 0])
        seg = up > self.mask_threshold

        out = []
        for i in np.argsort(-areas):
            x0, y0, x1, y1 = boxes[i]
            out.append({
                "segmentation": seg[i],
                "area": int(seg[i].sum()),
                "predicted_iou": float(ious[i]),
                "stability_score": float(stabs[i]),
                "bbox": [float(x0), float(y0), float(x1 - x0),
                         float(y1 - y0)],
            })
        return out
