"""Paired (image, mask) augmentations for the polyp datasets.

Behavioral spec: reference dataloaders/PolypTransforms.py:43-612 (vendored
torchvision-style paired transforms; get_polyp_transform :590-612 composes
ColorJitter + RandomVerticalFlip + RandomHorizontalFlip + RandomAffine).
numpy/cv2 implementation; every transform takes and returns
(image (H, W, 3) float, mask (H, W) float).
"""

from __future__ import annotations

import cv2
import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, mask):
        for t in self.transforms:
            img, mask = t(img, mask)
        return img, mask


class RandomHorizontalFlip:
    def __init__(self, p=0.5, rng=None):
        self.p, self.rng = p, rng or np.random

    def __call__(self, img, mask):
        if self.rng.random() < self.p:
            return img[:, ::-1].copy(), mask[:, ::-1].copy()
        return img, mask


class RandomVerticalFlip:
    def __init__(self, p=0.5, rng=None):
        self.p, self.rng = p, rng or np.random

    def __call__(self, img, mask):
        if self.rng.random() < self.p:
            return img[::-1].copy(), mask[::-1].copy()
        return img, mask


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter on float RGB in [0, 255]."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1, rng=None):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue
        self.rng = rng or np.random

    def __call__(self, img, mask):
        img = img.astype(np.float32)
        if self.b:
            img = img * self.rng.uniform(1 - self.b, 1 + self.b)
        if self.c:
            mean = img.mean()
            img = (img - mean) * self.rng.uniform(1 - self.c, 1 + self.c) + mean
        if self.s:
            gray = img.mean(axis=-1, keepdims=True)
            img = (img - gray) * self.rng.uniform(1 - self.s, 1 + self.s) + gray
        if self.h:
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] +
                           self.rng.uniform(-self.h, self.h) * 180) % 180
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2RGB).astype(np.float32)
        return np.clip(img, 0, 255), mask


class RandomAffinePair:
    def __init__(self, degrees=90, translate=(0.1, 0.1), scale=(0.75, 1.25),
                 rng=None):
        self.degrees, self.translate, self.scale = degrees, translate, scale
        self.rng = rng or np.random

    def __call__(self, img, mask):
        h, w = img.shape[:2]
        ang = self.rng.uniform(-self.degrees, self.degrees)
        sc = self.rng.uniform(*self.scale)
        tx = self.rng.uniform(-self.translate[0], self.translate[0]) * w
        ty = self.rng.uniform(-self.translate[1], self.translate[1]) * h
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
        m[:, 2] += (tx, ty)
        img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR)
        mask = cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST)
        return img, mask


def get_polyp_transform(rng=None):
    """(train_transform, test_transform) — reference
    PolypTransforms.get_polyp_transform :590-612."""
    train = Compose([
        ColorJitter(rng=rng),
        RandomVerticalFlip(rng=rng),
        RandomHorizontalFlip(rng=rng),
        RandomAffinePair(rng=rng),
    ])
    test = Compose([])
    return train, test
