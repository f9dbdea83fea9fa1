"""Polyp (2D RGB endoscopy) dataset — reference dataloaders/PolypDataset.py.

Kvasir/CVC/ETIS-style layout: ``<root>/<dataset>/{images,masks}`` with a
``split.txt`` (train:/val:/test: sections).  Queries come from the test
split; supports are sampled from the train split, directories, or a txt
list (reference :228-316).  Preprocessing: per-dataset mean/std
normalization + bilinear resize (or the SAM longest-side transform with
pad, ``sam_trans`` mode, reference :319-348).
"""

from __future__ import annotations

import os
import random

import cv2
import numpy as np

from protosam_tpu.ops.resize import longest_side_size

DATASETS = ("Kvasir", "CVC-ClinicDB", "CVC-ColonDB", "CVC-300", "ETIS")


def _cv2_load(path: str, is_mask: bool) -> np.ndarray:
    if is_mask:
        m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return (m > 127).astype(np.float32)
    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    return img.astype(np.float32)


def _read_split(text_file: str, split: str) -> list[str]:
    splits: dict[str, list[str]] = {"train": [], "val": [], "test": []}
    cur = None
    with open(text_file) as f:
        for line in f:
            line = line.strip()
            if line.rstrip(":") in splits:
                cur = line.rstrip(":")
            elif line and cur:
                splits[cur].append(line)
    return splits[split]


class PolypDataset:
    def __init__(self, root: str, trainsize: int = 352, train: bool = True,
                 use_sam_trans: bool = True, image_size=(1024, 1024),
                 datasets=DATASETS, ds_mean=None, ds_std=None,
                 seed: int | None = None):
        self.root = root
        self.image_size = (image_size, image_size) \
            if isinstance(image_size, int) else tuple(image_size)
        self.train = train
        self.use_sam_trans = use_sam_trans
        self.rng = random.Random(seed)

        self.images: list[str] = []
        self.gts: list[str] = []
        split = "train" if train else "test"
        for folder in sorted(os.listdir(root)):
            if folder not in datasets:
                continue
            split_file = os.path.join(root, folder, "split.txt")
            if not os.path.isfile(split_file):
                continue
            for name in _read_split(split_file, split):
                self.images.append(os.path.join(root, folder, "images",
                                                name + ".png"))
                self.gts.append(os.path.join(root, folder, "masks",
                                             name + ".png"))
        self.images.sort()
        self.gts.sort()
        self.size = len(self.images)

        if ds_mean is not None:
            self.mean, self.std = ds_mean, ds_std
        elif self.size and not use_sam_trans:
            sample = _cv2_load(self.images[0], is_mask=False)
            self.mean, self.std = float(sample.mean()), float(sample.std())
        else:
            self.mean, self.std = 0.0, 1.0

    def __len__(self):
        return self.size

    def process_image_gt(self, image: np.ndarray, gt: np.ndarray,
                         case: str = "") -> dict:
        """(H, W, 3) float image + (H, W) mask -> CHW tensors in the model
        frame (reference process_image_gt :319-348)."""
        original_size = image.shape[:2]
        img = image.transpose(2, 0, 1)
        if self.use_sam_trans:
            tgt = max(self.image_size)
            nh, nw = longest_side_size(*original_size, tgt)
            img = cv2.resize(image, (nw, nh),
                             interpolation=cv2.INTER_LINEAR).transpose(2, 0, 1)
            m = cv2.resize(gt, (nw, nh), interpolation=cv2.INTER_LINEAR)
            img = np.pad(img, ((0, 0), (0, tgt - nh), (0, tgt - nw)))
            m = np.pad(m, ((0, tgt - nh), (0, tgt - nw)))
        else:
            img = (img - self.mean) / self.std
            img = cv2.resize(img.transpose(1, 2, 0), self.image_size[::-1],
                             interpolation=cv2.INTER_LINEAR).transpose(2, 0, 1)
            m = cv2.resize(gt, self.image_size[::-1],
                           interpolation=cv2.INTER_NEAREST)
        m = (m > 0.5).astype(np.float32)
        return {"image": img.astype(np.float32), "label": m,
                "original_size": original_size, "case": case}

    def __getitem__(self, index: int) -> dict:
        img = _cv2_load(self.images[index], is_mask=False)
        gt = _cv2_load(self.gts[index], is_mask=True)
        case = os.path.basename(os.path.dirname(
            os.path.dirname(self.images[index])))
        return self.process_image_gt(img, gt, case)

    def get_support(self, n_support: int = 1, support_image_dir=None,
                    support_mask_dir=None, text_file=None):
        """(support_images [n x (1, C, H, W)], support_labels, case) —
        reference get_support :291-316."""
        if support_image_dir and support_mask_dir:
            imgs = sorted(os.path.join(support_image_dir, f)
                          for f in os.listdir(support_image_dir)
                          if f.endswith((".jpg", ".png")))
            gts = sorted(os.path.join(support_mask_dir, f)
                         for f in os.listdir(support_mask_dir)
                         if f.endswith(".png"))
            pairs = [(imgs[i], gts[i]) for i in
                     (self.rng.randrange(len(imgs))
                      for _ in range(n_support))]
        elif text_file:
            with open(text_file) as f:
                rows = [line.strip().split() for line in f if line.strip()]
            if n_support > len(rows):
                raise ValueError("n_support larger than support list")
            pairs = [tuple(r) for r in rows[:n_support]]
        else:
            idxs = [self.rng.randrange(self.size) for _ in range(n_support)]
            pairs = [(self.images[i], self.gts[i]) for i in idxs]

        sup_imgs, sup_gts, case = [], [], ""
        for ip, gp in pairs:
            out = self.process_image_gt(_cv2_load(ip, False),
                                        _cv2_load(gp, True),
                                        os.path.basename(os.path.dirname(
                                            os.path.dirname(ip))))
            sup_imgs.append(out["image"][None])
            sup_gts.append(out["label"][None])
            case = out["case"]
        return sup_imgs, sup_gts, case


class SuperpixPolypDataset(PolypDataset):
    """SSL episodic variant (reference PolypDataset.py:419-505): a random
    superpixel of the query image becomes the pseudo-label, and two
    augmentation draws of the same image form the (support, query) pair.
    Superpixels come from the native Felzenszwalb kernel (the reference
    precomputes them with skimage)."""

    def __init__(self, *args, num_rep: int = 2, transforms=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_rep = num_rep
        self.transforms = transforms

    def __getitem__(self, index: int) -> dict:
        from protosam_tpu.data.prepare import felzenszwalb

        img = _cv2_load(self.images[index], is_mask=False)
        gray = img.mean(axis=-1).astype(np.float32)
        seg = felzenszwalb(gray, scale=100.0, sigma=1.0, min_size=400)
        ids = np.unique(seg)
        ids = ids[ids > 0] if (ids > 0).any() else ids
        pick = ids[self.rng.randrange(len(ids))]
        pseudo = (seg == pick).astype(np.float32)

        pair = []
        for _ in range(self.num_rep):
            im, m = (self.transforms(img, pseudo) if self.transforms
                     else (img, pseudo))
            out = self.process_image_gt(im, m)
            pair.append(out)
        support, query = pair[0], pair[1]
        fg = support["label"]
        return {
            "class_ids": [[1]],
            "support_images": [[support["image"]]],
            "support_mask": [[{"fg_mask": fg, "bg_mask": 1.0 - fg}]],
            "query_images": [query["image"]],
            "query_labels": [query["label"]],
            "superpix_label": int(pick),
        }
