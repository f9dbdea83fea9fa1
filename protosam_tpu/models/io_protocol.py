"""Input/output protocol classes — API parity with the reference wrappers.

Mirrors reference models/ProtoSAM.py:46-182 (SegmentationInput/Output ABCs,
ALPNetInput/Output, SAMWrapperInput, InputFactory, ModelWrapper,
ALPNetWrapper) with jax arrays.  ``to(device)`` maps to jax.device_put.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

TYPE_ALPNET = "alpnet"
TYPE_SAM = "sam"

CONF_MODE = "conf"
CENTROID_MODE = "centroid"
BOTH_MODE = "both"
POINT_MODES = (CONF_MODE, CENTROID_MODE, BOTH_MODE)


class SegmentationInput(ABC):
    @abstractmethod
    def set_query_images(self, query_images):
        ...

    def to(self, device):
        return self


class SegmentationOutput(ABC):
    @abstractmethod
    def get_prediction(self):
        ...


class ALPNetInput(SegmentationInput):
    """Episode input (reference ProtoSAM.py:59-79).

    support_images: (S, 3, H, W); support_labels: (S, H, W) binary;
    query_images: (1, 3, H, W).  Accepts the reference's way×shot list
    nesting too and flattens it.
    """

    def __init__(self, support_images, support_labels, query_images,
                 isval: bool = True, val_wsize: int = 2, show_viz=False,
                 supp_fts=None):
        self.supp_imgs = _stack(support_images)
        self.fore_mask = _stack(support_labels)
        self.back_mask = 1.0 - self.fore_mask
        self.qry_imgs = jnp.asarray(query_images)
        self.isval = isval
        self.val_wsize = val_wsize
        self.show_viz = show_viz
        self.supp_fts = supp_fts

    def set_query_images(self, query_images):
        self.qry_imgs = jnp.asarray(query_images)

    def to(self, device):
        self.supp_imgs = jax.device_put(self.supp_imgs, device)
        self.fore_mask = jax.device_put(self.fore_mask, device)
        self.back_mask = jax.device_put(self.back_mask, device)
        self.qry_imgs = jax.device_put(self.qry_imgs, device)
        if self.supp_fts is not None:
            self.supp_fts = jax.device_put(self.supp_fts, device)
        return self


def _stack(x) -> jax.Array:
    """Flatten the reference's way×shot list nesting (each leaf a (1, ...)
    batch-1 tensor) into one (S, ...) array; pass arrays through."""
    if not isinstance(x, (list, tuple)):
        return jnp.asarray(x)
    flat = []
    for way in x:
        for leaf in (way if isinstance(way, (list, tuple)) else [way]):
            flat.append(jnp.asarray(leaf))
    return jnp.concatenate(flat, axis=0)


class ALPNetOutput(SegmentationOutput):
    def __init__(self, pred, align_loss=0.0, sim_maps=None, assign_maps=None,
                 proto_grid=None, supp_fts=None, qry_fts=None):
        self.pred = pred
        self.align_loss = align_loss
        self.sim_maps = sim_maps
        self.assign_maps = assign_maps
        self.proto_grid = proto_grid
        self.supp_fts = supp_fts
        self.qry_fts = qry_fts

    def get_prediction(self):
        return self.pred


class SAMWrapperInput(SegmentationInput):
    """Oracle-baseline input (reference ProtoSAM.py:94-109)."""

    def __init__(self, image, image_labels):
        self.image = image
        self.image_labels = image_labels

    def set_query_images(self, query_images):
        q = np.asarray(query_images)
        b, c, h, w = q.shape
        assert b == 1, "batch size must be 1"
        q = (q - q.min()) / (q.max() - q.min()) * 255
        self.image = np.transpose(q.astype(np.uint8)[0], (1, 2, 0))


class InputFactory(ABC):
    @staticmethod
    def create_input(input_type, query_image, support_images=None,
                     support_labels=None, isval=False, val_wsize=None,
                     show_viz=False, supp_fts=None, original_sz=None,
                     img_sz=None, gts=None):
        if input_type == TYPE_ALPNET:
            return ALPNetInput(support_images, support_labels, query_image,
                               isval, val_wsize, show_viz, supp_fts)
        if input_type == TYPE_SAM:
            q = np.asarray(query_image)
            b, c, h, w = q.shape
            assert b == 1, "batch size must be 1"
            g = np.asarray(gts).astype(np.uint8).reshape(h, w)
            g[g > 0] = 1
            q = q.reshape(h, w, c)
            q = ((q - q.min()) / (q.max() - q.min()) * 255).astype(np.uint8)
            return SAMWrapperInput(q, g)
        raise ValueError("input_type not supported")


class ModelWrapper(ABC):
    def __init__(self, model, params=None):
        self.model = model
        self.params = params

    def __call__(self, input_data: SegmentationInput) -> Any:
        ...

    def eval(self):
        return self

    def train(self):
        return self


class ALPNetWrapper(ModelWrapper):
    """Calls the flax FewShotSeg and returns the logits
    (reference ProtoSAM.py:155-168 returns output.pred)."""

    def __call__(self, input_data: ALPNetInput):
        out = self.model.apply(
            {"params": self.params}, input_data.supp_imgs,
            input_data.fore_mask, input_data.back_mask, input_data.qry_imgs,
            input_data.isval, input_data.val_wsize,
            supp_fts=input_data.supp_fts)
        return out["logits"]


class SamWrapperWrapper(ModelWrapper):
    """Oracle-baseline adapter (reference ProtoSAM.py:170-179): runs the
    automatic-mask-generator wrapper and shapes the best mask like 2-class
    logits."""

    def __call__(self, input_data: SAMWrapperInput):
        pred = self.model(input_data.image, input_data.image_labels)
        pred = jnp.asarray(pred, jnp.float32)[None, None]
        return jnp.concatenate([1.0 - pred, pred], axis=1)
