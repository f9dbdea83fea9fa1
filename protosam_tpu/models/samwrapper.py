"""SAM oracle-baseline wrapper (reference models/SamWrapper.py:15-66).

Runs the automatic mask generator over the query image and returns the
generated mask with the best IoU against the ground-truth label — an oracle
upper bound selected with ``base_model=SAM`` (reference config
config_ssl_upload.py:94, call path ProtoSAM.py:170-179).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from protosam_tpu.models.sam.amg import SamAutomaticMaskGenerator
from protosam_tpu.models.sam.sam import preprocess
from protosam_tpu.ops.resize import longest_side_size, resize_bilinear_antialias


def get_iou(pred: np.ndarray, label: np.ndarray) -> float:
    """reference SamWrapper.py:8-13."""
    tp = np.logical_and(pred, label).sum()
    fp = np.logical_and(pred, 1 - label).sum()
    fn = np.logical_and(1 - pred, label).sum()
    return float(tp / max(tp + fp + fn, 1e-6))


class SamWrapper:
    def __init__(self, sam_model, sam_params, **amg_kwargs):
        self.sam = sam_model
        self.params = sam_params
        self.amg = SamAutomaticMaskGenerator(sam_model, sam_params,
                                             **amg_kwargs)

    def __call__(self, image: np.ndarray, image_labels: np.ndarray
                 ) -> np.ndarray:
        """image: (H, W, 3) uint8; image_labels: (H, W) binary GT.

        Returns the best-IoU generated mask (H, W) float.
        """
        h, w = image.shape[:2]
        tgt = self.sam.image_size
        nh, nw = longest_side_size(h, w, tgt)
        x = jnp.asarray(image, jnp.float32)[None]
        x = resize_bilinear_antialias(x.transpose(0, 3, 1, 2), (nh, nw))
        x = preprocess(x.transpose(0, 2, 3, 1), tgt)
        emb = self.sam.apply({"params": self.params}, x,
                             method=self.sam.encode_image)
        records = self.amg.generate(emb, (h, w), tgt)
        best, best_iou = np.zeros((h, w), np.float32), -1.0
        for rec in records:
            iou = get_iou(rec["segmentation"], image_labels)
            if iou > best_iou:
                best_iou = iou
                best = rec["segmentation"].astype(np.float32)
        return best
