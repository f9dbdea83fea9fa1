"""Host-side training augmentations.

Behavioral spec: reference dataloaders/augutils.py (recipes, gamma,
transform_with_label) + dataloaders/image_transforms.py (cv2 warpAffine
random affine, Gaussian-displacement elastic deformation, random flips).
These run on the host feeding the device input pipeline, exactly like the
reference's dataloader workers.
"""

from __future__ import annotations

import copy
from typing import Callable

import cv2
import numpy as np
from numpy.lib.stride_tricks import as_strided
from scipy.ndimage import map_coordinates


def get_aug(which_aug: str, input_size: int) -> dict:
    """Aug recipe dicts (reference augutils.py:16-57)."""
    if which_aug == "sabs_aug":
        return {"aug": {
            "flip": {"v": False, "h": False, "t": False, "p": 0.25},
            "affine": {"rotate": 5, "shift": (5, 5), "shear": 5,
                       "scale": (0.9, 1.2)},
            "elastic": {"alpha": 10, "sigma": 5},
            "patch": input_size,
            "reduce_2d": True,
            "gamma_range": (0.5, 1.5),
        }}
    if which_aug == "aug_v3":
        return {"aug": {
            "flip": {"v": False, "h": False, "t": False, "p": 0.25},
            "affine": {"rotate": 30, "shift": (30, 30), "shear": 30,
                       "scale": (0.8, 1.3)},
            "elastic": {"alpha": 20, "sigma": 5},
            "patch": input_size,
            "reduce_2d": True,
            "gamma_range": (0.2, 1.8),
        }}
    raise NotImplementedError(which_aug)


# ---- affine ----------------------------------------------------------------

def _rotation_matrix(deg: float, shape) -> np.ndarray:
    m = cv2.getRotationMatrix2D((shape[0] / 2, shape[1] // 2), deg, 1)
    return np.vstack([m, [0, 0, 1]])


def _zoom_matrix(z: float, shape) -> np.ndarray:
    m = cv2.getRotationMatrix2D((shape[0] / 2, shape[1] // 2), 0, z)
    return np.vstack([m, [0, 0, 1]])


def _translation_matrix(tx: float, ty: float) -> np.ndarray:
    return np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)


def _shear_matrix(deg: float) -> np.ndarray:
    t = np.pi * deg / 180
    return np.array([[1, -np.sin(t), 0], [0, np.cos(t), 0], [0, 0, 1]])


class RandomAffine:
    """cv2.warpAffine-based random affine (reference image_transforms.py:72-188):
    rotation/translation/shear/zoom matrices composed left-to-right, a single
    shared transform across channels."""

    def __init__(self, rotation_range=None, translation_range=None,
                 shear_range=None, zoom_range=None, zoom_keep_aspect=True,
                 order=3, rng: np.random.RandomState | None = None):
        self.rotation_range = rotation_range
        self.translation_range = translation_range
        self.shear_range = shear_range
        self.zoom_range = zoom_range
        self.zoom_keep_aspect = zoom_keep_aspect
        self.order = order
        self.rng = rng or np.random

    def build_matrix(self, shape) -> np.ndarray:
        tfx = []
        if self.rotation_range:
            tfx.append(_rotation_matrix(
                self.rng.uniform(-self.rotation_range, self.rotation_range),
                shape))
        if self.translation_range:
            tx = self.rng.uniform(-self.translation_range[0],
                                  self.translation_range[0])
            ty = self.rng.uniform(-self.translation_range[1],
                                  self.translation_range[1])
            tfx.append(_translation_matrix(tx, ty))
        if self.shear_range:
            tfx.append(_shear_matrix(
                self.rng.uniform(-self.shear_range, self.shear_range)))
        if self.zoom_range:
            sx = self.rng.uniform(*self.zoom_range)
            tfx.append(_zoom_matrix(sx, shape))
        m = np.eye(3)
        for t in tfx:
            m = t @ m
        return m.astype(np.float32)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        m = self.build_matrix(image.shape[:2])[:2]
        shape = image.shape
        warped = cv2.warpAffine(
            image.reshape(shape[:2] + (-1,)), m, shape[:2][::-1],
            flags=self.order if isinstance(self.order, int) else cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT)
        return warped.reshape(shape)


# ---- elastic ---------------------------------------------------------------

def elastic_transform_nd(image: np.ndarray, alpha: float, sigma: float,
                         rng=None, order: int = 1) -> np.ndarray:
    """Gaussian-smoothed displacement elastic deformation
    (reference image_transforms.py:252-320): cv2 GaussianBlur of uniform
    noise, shared displacement across channels, reflect-mode resampling."""
    rng = rng or np.random.RandomState(None)
    shape = image.shape
    imsize = shape[:2]
    dim = shape[2:]

    blur = int(4 * sigma) | 1
    dx = cv2.GaussianBlur(rng.rand(*imsize) * 2 - 1, ksize=(blur, blur),
                          sigmaX=sigma) * alpha
    dy = cv2.GaussianBlur(rng.rand(*imsize) * 2 - 1, ksize=(blur, blur),
                          sigmaX=sigma) * alpha

    dx = as_strided(dx.astype(np.float32),
                    strides=(0,) * len(dim) + (4 * shape[1], 4),
                    shape=dim + (shape[0], shape[1]))
    dx = np.transpose(dx, axes=(-2, -1) + tuple(range(len(dim))))
    dy = as_strided(dy.astype(np.float32),
                    strides=(0,) * len(dim) + (4 * shape[1], 4),
                    shape=dim + (shape[0], shape[1]))
    dy = np.transpose(dy, axes=(-2, -1) + tuple(range(len(dim))))

    coord = np.meshgrid(*[np.arange(s) for s in (shape[1], shape[0]) + dim])
    indices = [np.reshape(e + de, (-1, 1))
               for e, de in zip([coord[1], coord[0]] + list(coord[2:]),
                                [dy, dx] + [0] * len(dim))]
    return map_coordinates(image, indices, order=order,
                           mode="reflect").reshape(shape)


class ElasticTransform:
    def __init__(self, alpha, sigma, order=1, rng=None):
        self.alpha, self.sigma, self.order = alpha, sigma, order
        self.rng = rng

    def __call__(self, image):
        return elastic_transform_nd(image, self.alpha, self.sigma,
                                    rng=self.rng, order=self.order)


class RandomFlip3D:
    def __init__(self, h=True, v=True, t=True, p=0.5, rng=None):
        self.h, self.v, self.t, self.p = h, v, t, p
        self.rng = rng or np.random

    def __call__(self, x):
        if self.h and self.rng.random() < self.p:
            x = x[::-1, ...]
        if self.v and self.rng.random() < self.p:
            x = x[:, ::-1, ...]
        if self.t and self.rng.random() < self.p:
            x = x[..., ::-1]
        return x


# ---- intensity + composition ----------------------------------------------

def gamma_transform(img: np.ndarray, gamma_range, rng=None) -> np.ndarray:
    """Range-preserving random gamma (reference augutils.py:119-136)."""
    rng = rng or np.random
    if gamma_range is False:
        return img
    gamma = rng.rand() * (gamma_range[1] - gamma_range[0]) + gamma_range[0]
    cmin = img.min()
    irange = img.max() - cmin + 1e-5
    img = img - cmin + 1e-5
    img = irange * np.power(img * 1.0 / irange, gamma)
    return img + cmin


def get_geometric_transformer(aug: dict, order=3, rng=None) -> Callable:
    """Flip ∘ affine ∘ elastic composition (reference augutils.py:65-89)."""
    a = aug["aug"]
    tfx = []
    if "flip" in a:
        tfx.append(RandomFlip3D(**a["flip"], rng=rng))
    if "affine" in a:
        af = a["affine"]
        tfx.append(RandomAffine(af.get("rotate"), af.get("shift"),
                                af.get("shear"), af.get("scale"),
                                af.get("scale_iso", True), order=order,
                                rng=rng))
    if "elastic" in a:
        tfx.append(ElasticTransform(a["elastic"]["alpha"],
                                    a["elastic"]["sigma"], rng=rng))

    def compose(x):
        for t in tfx:
            x = t(x)
        return x

    return compose


def transform_with_label(aug: dict, rng=None) -> Callable:
    """Joint geometric+intensity transform of [H, W, C+1] compact-label
    arrays (reference augutils.py:144-190): label goes through geometry as
    one-hot (rounded back), image additionally gets gamma."""
    geometric = get_geometric_transformer(aug, rng=rng)
    gamma_range = aug["aug"]["gamma_range"]

    def transform(comp, c_label, c_img, use_onehot, nclass, **kwargs):
        comp = copy.deepcopy(comp)
        assert c_img + 1 == comp.shape[-1], "only single-slice 2D label"
        label = comp[..., c_img]
        h_label = np.float32(np.arange(nclass) == label[..., None])
        comp = np.concatenate([comp[..., :c_img], h_label], -1)
        comp = geometric(comp)
        t_label_h = np.rint(comp[..., c_img:])
        assert t_label_h.max() <= 1
        t_img = gamma_transform(comp[..., 0:c_img], gamma_range, rng=rng)
        if use_onehot:
            return t_img, t_label_h
        return t_img, np.expand_dims(np.argmax(t_label_h, axis=-1), -1)

    return transform
