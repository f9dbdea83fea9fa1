"""Automatic mask generation (reference segment_anything/automatic_mask_generator.py
+ utils/amg.py), TPU-style.

A fixed 32×32 point grid is decoded *batched* through the mask decoder
(multimask), then filtered by predicted IoU and stability score, deduplicated
with box NMS — all static-shape device math except the final host-side
compaction.  ``crop_n_layers>0`` additionally sweeps zoomed-in crops (each
re-encoded, reference automatic_mask_generator.py:216-229) with per-layer
downscaled grids, dedup across crops preferring smaller crops;
``min_mask_region_area`` removes small holes/islands per mask via the
device CCA (reference utils/amg.py:267-292 uses cv2); ``output_mode``
supports binary_mask / uncompressed_rle / coco_rle.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from protosam_tpu.models.sam.rle import coco_encode_rle, mask_to_rle
from protosam_tpu.ops.resize import resize_bilinear


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced [0,1]² grid (reference utils/amg.py:179-187)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (N, 2) xy


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> list[np.ndarray]:
    """Per-crop-layer grids (reference utils/amg.py:190-198)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: tuple[int, int], n_layers: int,
                        overlap_ratio: float
                        ) -> tuple[list[list[int]], list[int]]:
    """XYXY crop boxes per layer: layer i has (2^i)^2 overlapping crops
    (reference utils/amg.py:200-233)."""
    import math
    from itertools import product

    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                               min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str
                         ) -> tuple[np.ndarray, bool]:
    """Remove small disconnected regions ('islands') or fill small holes
    (reference utils/amg.py:267-292; cv2.connectedComponentsWithStats
    replaced by the device CCA, which is cv2-bit-equal —
    tests/test_cca_prompts.py)."""
    import jax.numpy as jnp

    from protosam_tpu.ops.cca import label_components

    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, np.asarray(mask, bool))
    if not working.any():
        return mask, False
    lab = np.asarray(label_components(jnp.asarray(working)))
    ids, counts = np.unique(lab[working], return_counts=True)
    small = ids[counts < area_thresh]
    if small.size == 0:
        return mask, False
    if correct_holes:
        return mask | (np.isin(lab, small) & working), True
    keep = ids[counts >= area_thresh]
    if keep.size == 0:  # every region small: keep the largest
        keep = ids[[int(np.argmax(counts))]]
    return np.isin(lab, keep) & working, True


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
    automatic_mask_generator.py:35-380)."""

    def __init__(self, sam_model, sam_params, *, points_per_side: int = 32,
                 points_per_batch: int = 64, pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, mask_threshold: float = 0.0,
                 crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 min_mask_region_area: int = 0,
                 output_mode: str = "binary_mask"):
        assert output_mode in ("binary_mask", "uncompressed_rle",
                               "coco_rle"), output_mode
        self.sam = sam_model
        self.params = sam_params
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.mask_threshold = mask_threshold
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self._grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_n_points_downscale_factor)

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

    def _encode(self, image: np.ndarray, image_size: int):
        """Longest-side resize + SAM preprocess + encode (the predictor's
        set_image path) for crop re-encoding.  Returns (embedding,
        (ih, iw) valid frame)."""
        from protosam_tpu.models.sam.sam import preprocess
        from protosam_tpu.ops.resize import (
            longest_side_size,
            resize_bilinear_antialias,
        )

        h, w = image.shape[:2]
        nh, nw = longest_side_size(h, w, image_size)
        x = jnp.asarray(image, jnp.float32)[None].transpose(0, 3, 1, 2)
        x = resize_bilinear_antialias(x, (nh, nw))
        x = preprocess(x.transpose(0, 2, 3, 1), image_size)
        emb = self.sam.apply({"params": self.params}, x,
                             method=self.sam.encode_image)
        return emb, (nh, nw)

    def _process_crop(self, emb, crop_box, layer_idx, image_size,
                      frame_hw):
        """Decode the layer's point grid against one crop embedding;
        returns host-side dict with low-res masks + geometry mapped to the
        ORIGINAL frame (reference _process_crop, :228-260)."""
        x0, y0, x1, y1 = crop_box
        ch, cw = y1 - y0, x1 - x0
        ih, iw = frame_hw
        # grid fractions of the crop -> SAM-frame coords: apply_coords
        # multiplies by (iw/cw, ih/ch), so fraction * crop * that = (iw, ih)
        coords_all = jnp.asarray(
            self._grids[layer_idx] * np.array([iw, ih]), jnp.float32)
        n = coords_all.shape[0]
        low_side = image_size // 4  # decoder low-res frame
        # low-res -> crop pixels -> original frame
        sy = (image_size / low_side) * (ch / ih)
        sx = (image_size / low_side) * (cw / iw)

        masks, ious, stabs, boxes, areas, points = [], [], [], [], [], []
        for i in range(0, n, self.points_per_batch):
            chunk = coords_all[i:i + self.points_per_batch][:, None, :]
            m, io, st, bx, ar = self._decode_batch(self.params, emb, chunk)
            keepable = (io > self.pred_iou_thresh) &                 (st > self.stability_score_thresh)
            idx = np.nonzero(np.asarray(keepable))[0]
            masks.append(np.asarray(m)[idx])
            ious.append(np.asarray(io)[idx])
            stabs.append(np.asarray(st)[idx])
            boxes.append(np.asarray(bx)[idx])
            areas.append(np.asarray(ar)[idx])
            # each grid point yields 3 multimask candidates
            pts = np.asarray(chunk[:, 0])  # (chunk, 2) sam-frame xy
            pts = np.repeat(pts, m.shape[0] // pts.shape[0], axis=0)
            # back to original-image coords
            pts = pts * np.array([cw / iw, ch / ih]) + np.array([x0, y0])
            points.append(pts[idx])

        boxes = np.concatenate(boxes).astype(np.float32)
        if boxes.shape[0]:
            boxes = boxes * np.array([sx, sy, sx, sy]) +                 np.array([x0, y0, x0, y0])
        rec = {
            "low_res": np.concatenate(masks),
            "iou": np.concatenate(ious),
            "stab": np.concatenate(stabs),
            "box": boxes.reshape(-1, 4),
            "area": (np.concatenate(areas) * sy * sx).astype(np.float32),
            "point": (np.concatenate(points).reshape(-1, 2)
                      if points else np.zeros((0, 2), np.float32)),
            "crop_box": np.repeat(np.asarray([crop_box], np.float32),
                                  len(np.concatenate(ious)), axis=0),
        }
        # per-crop NMS by predicted IoU (reference :250-257); box IoU is
        # scale/offset-invariant so original-frame boxes give the same keeps
        if rec["box"].shape[0]:
            keep = np.asarray(nms_keep(
                jnp.asarray(rec["box"]), jnp.asarray(rec["iou"]),
                jnp.ones(len(rec["box"]), bool), self.box_nms_thresh))
            rec = {k: v[keep] for k, v in rec.items()}
        return rec

    def _upscale_to_original(self, low_res, crop_box, image_size,
                             frame_hw, original_size):
        """Low-res decoder mask -> crop frame -> paste at the crop offset
        in an original-size canvas (reference uncrop_masks)."""
        x0, y0, x1, y1 = (int(v) for v in crop_box)
        ch, cw = y1 - y0, x1 - x0
        ih, iw = frame_hw
        up = np.asarray(resize_bilinear(
            jnp.asarray(low_res)[None, None],
            (image_size, image_size))[0, 0])
        up = up[:ih, :iw]
        up = np.asarray(resize_bilinear(jnp.asarray(up)[None, None],
                                        (ch, cw))[0, 0])
        seg = np.zeros(original_size, bool)
        seg[y0:y1, x0:x1] = up > self.mask_threshold
        return seg

    def generate(self, image_embedding=None,
                 original_size: tuple[int, int] | None = None,
                 image_size: int = 1024, *,
                 image: np.ndarray | None = None) -> list[dict[str, Any]]:
        """image_embedding: (1, 64, 64, 256) from sam.encode_image for the
        FULL image (its frame must be the longest-side resize of
        ``original_size``); ``image`` (H, W, 3) is required when
        ``crop_n_layers > 0`` so deeper crops can be re-encoded.

        Returns reference-style records sorted by area: {'segmentation'
        (per ``output_mode``), 'area', 'predicted_iou', 'stability_score',
        'bbox' XYWH, 'point_coords', 'crop_box' XYWH}.
        """
        from protosam_tpu.ops.resize import longest_side_size

        if original_size is None:
            original_size = image.shape[:2]
        frame_full = longest_side_size(original_size[0], original_size[1],
                                       image_size)
        crop_boxes, layer_idxs = generate_crop_boxes(
            original_size, self.crop_n_layers, self.crop_overlap_ratio)
        if self.crop_n_layers > 0 and image is None:
            raise ValueError("crop_n_layers > 0 requires the image "
                             "(crops are re-encoded)")

        recs = []
        for crop_box, layer in zip(crop_boxes, layer_idxs):
            if layer == 0 and image_embedding is not None:
                emb, frame = image_embedding, frame_full
            else:
                x0, y0, x1, y1 = crop_box
                emb, frame = self._encode(image[y0:y1, x0:x1], image_size)
            recs.append((self._process_crop(emb, crop_box, layer,
                                            image_size, frame),
                         crop_box, frame))

        data = {k: np.concatenate([r[0][k] for r in recs])
                for k in recs[0][0]}
        frames = np.concatenate(
            [np.repeat([r[2]], len(r[0]["iou"]), axis=0) for r in recs])
        if data["iou"].shape[0] == 0:
            return []

        # cross-crop dedup preferring smaller crops (reference :211-223)
        if len(crop_boxes) > 1:
            cb = data["crop_box"]
            crop_area = (cb[:, 2] - cb[:, 0]) * (cb[:, 3] - cb[:, 1])
            keep = np.asarray(nms_keep(
                jnp.asarray(data["box"]), jnp.asarray(1.0 / crop_area),
                jnp.ones(len(crop_area), bool), self.crop_nms_thresh))
            data = {k: v[keep] for k, v in data.items()}
            frames = frames[keep]

        # upscale the kept masks into the original frame
        segs = [self._upscale_to_original(lr, cb, image_size, fr,
                                          original_size)
                for lr, cb, fr in zip(data["low_res"], data["crop_box"],
                                      frames)]

        # small-region postprocess (reference postprocess_small_regions,
        # :355-380): fill holes, drop islands, NMS preferring unchanged
        if self.min_mask_region_area > 0 and segs:
            scores = []
            for i, seg in enumerate(segs):
                seg, ch1 = remove_small_regions(
                    seg, self.min_mask_region_area, "holes")
                seg, ch2 = remove_small_regions(
                    seg, self.min_mask_region_area, "islands")
                segs[i] = seg
                scores.append(0.0 if (ch1 or ch2) else 1.0)
            boxes = np.stack([np.asarray(mask_to_box(jnp.asarray(s)))
                              for s in segs]).astype(np.float32)
            keep = np.asarray(nms_keep(
                jnp.asarray(boxes), jnp.asarray(scores, dtype=np.float32),
                jnp.ones(len(boxes), bool), max(self.box_nms_thresh,
                                                self.crop_nms_thresh)))
            segs = [s for s, k in zip(segs, keep) if k]
            data = {k: v[keep] for k, v in data.items()}
            data["box"] = boxes[keep]

        out = []
        areas = np.asarray([int(s.sum()) for s in segs])
        for i in np.argsort(-areas):
            seg = segs[i]
            rle = mask_to_rle(seg)
            if self.output_mode == "coco_rle":
                segment = coco_encode_rle(rle)
            elif self.output_mode == "uncompressed_rle":
                segment = rle
            else:
                segment = seg
            x0, y0, x1, y1 = data["box"][i]
            cx0, cy0, cx1, cy1 = data["crop_box"][i]
            out.append({
                "segmentation": segment,
                "area": int(areas[i]),
                "predicted_iou": float(data["iou"][i]),
                "stability_score": float(data["stab"][i]),
                "bbox": [float(x0), float(y0), float(x1 - x0),
                         float(y1 - y0)],
                "point_coords": [data["point"][i].tolist()],
                "crop_box": [float(cx0), float(cy0), float(cx1 - cx0),
                             float(cy1 - cy0)],
            })
        return out
