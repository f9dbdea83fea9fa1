"""Run-length mask encoding (reference segment_anything/utils/amg.py:107-152)."""

from __future__ import annotations

import numpy as np


def mask_to_rle(mask: np.ndarray) -> dict:
    """Binary (H, W) mask -> uncompressed column-major RLE
    {'size': [H, W], 'counts': [...]}, starting with a background run."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # column-major (F order)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in rle["counts"]:
        flat[pos:pos + c] = val
        pos += c
        val = not val
    return flat.reshape(w, h).T


def area_from_rle(rle: dict) -> int:
    return sum(rle["counts"][1::2])
