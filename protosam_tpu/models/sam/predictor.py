"""Stateful predictor facade — API parity with the reference SamPredictor
(segment_anything/predictor.py:17-269): ``set_image`` encodes once,
``predict`` decodes arbitrary prompt sets against the cached embedding.

The pipeline itself uses the functional batched path (pipeline/protosam);
this class serves users porting reference code that drives SamPredictor
directly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam.sam import (
    MASK_THRESHOLD,
    postprocess_masks,
    preprocess,
)
from protosam_tpu.ops.resize import longest_side_size, resize_bilinear_antialias


class SamPredictor:
    def __init__(self, sam_model, sam_params):
        self.model = sam_model
        self.params = sam_params
        self.reset_image()

    def reset_image(self):
        self.features = None
        self.original_size = None
        self.input_size = None
        self.is_image_set = False

    @functools.cached_property
    def _encode(self):
        return jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x, method=self.model.encode_image))

    @functools.cached_property
    def _decode(self):
        def fn(p, emb, coords, labels, boxes, mask_inputs, multimask,
               pad_points):
            return self.model.apply({"params": p}, emb, coords, labels,
                                    boxes, mask_inputs, multimask,
                                    pad_points, method=self.model.decode)
        return jax.jit(fn, static_argnames=("multimask", "pad_points"))

    def set_image(self, image: np.ndarray, image_format: str = "RGB"):
        """image: (H, W, 3) uint8 (reference predictor.py:34-60)."""
        if image_format == "BGR":
            image = image[..., ::-1]
        h, w = image.shape[:2]
        tgt = self.model.image_size
        nh, nw = longest_side_size(h, w, tgt)
        x = jnp.asarray(np.ascontiguousarray(image), jnp.float32)[None]
        x = resize_bilinear_antialias(x.transpose(0, 3, 1, 2), (nh, nw))
        x = preprocess(x.transpose(0, 2, 3, 1), tgt)
        self.features = self._encode(self.params, x)
        self.original_size = (h, w)
        self.input_size = (nh, nw)
        self.is_image_set = True

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output: bool = True,
                return_logits: bool = False):
        """(masks (M, H, W), iou_predictions (M,), low_res (M, 256, 256)) —
        reference predictor.py:92-170 (numpy in / numpy out)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...)")
        scale_w = self.input_size[1] / self.original_size[1]
        scale_h = self.input_size[0] / self.original_size[0]

        if point_coords is not None:
            coords = np.asarray(point_coords, np.float32) * \
                np.asarray([scale_w, scale_h])
            coords = jnp.asarray(coords)[None]
            labels = jnp.asarray(np.asarray(point_labels, np.int32))[None]
        else:
            coords = jnp.zeros((1, 0, 2))
            labels = jnp.zeros((1, 0), jnp.int32)
        boxes = None
        if box is not None:
            b = np.asarray(box, np.float32).reshape(-1, 4)
            b = b * np.asarray([scale_w, scale_h, scale_w, scale_h])
            boxes = jnp.asarray(b[:1])
        masks_in = None
        if mask_input is not None:
            masks_in = jnp.asarray(mask_input, jnp.float32).reshape(
                1, 256, 256, 1)

        low_res, iou = self._decode(self.params, self.features, coords,
                                    labels, boxes, masks_in,
                                    multimask_output, boxes is None)
        masks = postprocess_masks(low_res.astype(jnp.float32),
                                  self.input_size, self.original_size,
                                  self.model.image_size)
        masks = np.asarray(masks[0])
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        return masks, np.asarray(iou[0]), np.asarray(low_res[0])
