"""Offline data preparation — the reference's data_processing.ipynb as code.

Steps (reference data/data_processing.ipynb):
  1. intensity normalization: MR top-0.5% histogram cut; CT windowing is
     assumed done upstream;
  2. spatial resampling to a unified voxel spacing / in-plane resolution
     (256 or 672);
  3. superpixel pseudo-label generation: per-slice Felzenszwalb
     (min_size=400, sigma=1, scale=1) masked to the largest foreground
     component with filled holes;
  4. classmap JSONs (per-class z-slice lists with a min-fg-pixel filter).

The Felzenszwalb step runs through the native C++ kernel
(native/felzenszwalb.cc); scipy supplies resampling + hole filling.
"""

from __future__ import annotations

import ctypes
import glob
import json
import os
import re
import subprocess
import threading

import cv2
import numpy as np
from scipy.ndimage import binary_fill_holes, zoom

from protosam_tpu.data.nifti import NiftiImage, read_nii, write_nii

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "native")
_SO = os.path.join(_DIR, "libfelzenszwalb.so")
_SRC = os.path.join(_DIR, "felzenszwalb.cc")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC, "-o",
                            _SO], check=True, capture_output=True,
                           timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.felzenszwalb_2d.restype = ctypes.c_int
        lib.felzenszwalb_2d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def felzenszwalb(img: np.ndarray, scale: float = 1.0, sigma: float = 1.0,
                 min_size: int = 400) -> np.ndarray:
    """Per-slice graph segmentation, labels from 0 (skimage convention)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out = np.empty((h, w), np.int32)
    lib.felzenszwalb_2d(img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        h, w, scale, sigma, min_size,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def fg_mask_2d(img2d: np.ndarray, thresh: float) -> np.ndarray:
    """Largest connected foreground component with holes filled
    (notebook fg_mask2d)."""
    mask = np.float32(img2d > thresh)
    if mask.max() < 0.999:
        return mask
    n, lbl = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    if n <= 1:
        return mask
    counts = np.bincount(lbl.reshape(-1))[1:]
    largest = lbl == (np.argmax(counts) + 1)
    return binary_fill_holes(largest).astype(np.float32)


def superpix_masking(raw_seg: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero superpixels outside the body mask, relabel 1..n
    (notebook superpix_masking)."""
    seg = raw_seg.astype(np.int32) + 1       # reserve 0 for background
    seg = seg * (mask > 0)
    out = np.zeros_like(seg)
    for new_id, lbv in enumerate(np.unique(seg)):
        if lbv == 0:
            continue
        out[seg == lbv] = new_id  # unique() sorts, bg consumed id 0
    return out


def superpix_volume(img: np.ndarray, fg_thresh: float,
                    min_size: int = 400, sigma: float = 1.0) -> np.ndarray:
    """(z, y, x) volume -> per-slice masked superpixel labels."""
    out = np.zeros(img.shape, np.int32)
    for ii in range(img.shape[0]):
        seg = felzenszwalb(img[ii], scale=1.0, sigma=sigma,
                           min_size=min_size)
        mask = fg_mask_2d(img[ii], fg_thresh)
        out[ii] = superpix_masking(seg, mask)
    return out


def resample_volume(img: NiftiImage, new_spacing, is_label: bool = False
                    ) -> NiftiImage:
    """Spacing-based resampling (notebook resample_by_res).  Labels are
    resampled channel-by-channel linearly and argmaxed back, like
    resample_lb_by_res."""
    factors = [s_old / s_new for s_old, s_new in
               zip(img.spacing[::-1], new_spacing[::-1])]  # (z, y, x)
    if not is_label:
        arr = zoom(img.array.astype(np.float32), factors, order=1)
    else:
        vals = np.unique(img.array)
        chans = [zoom((img.array == v).astype(np.float32), factors, order=1)
                 for v in vals]
        arr = np.asarray(vals)[np.argmax(np.stack(chans), axis=0)]
    return NiftiImage(arr.astype(img.array.dtype
                                 if is_label else np.float32),
                      spacing=tuple(new_spacing), origin=img.origin,
                      direction=img.direction)


def normalize_mr(arr: np.ndarray, hist_cut_top: float = 0.5) -> np.ndarray:
    """Top-percentile histogram cut (notebook HIST_CUT_TOP)."""
    hir = float(np.percentile(arr, 100.0 - hist_cut_top))
    return np.minimum(arr, hir)


def build_classmaps(label_dir: str, out_dir: str, label_names: list[str],
                    min_fg_list=(1, 100)):
    """classmap_{min_fg}.json: per class, per scan, z slices with >= min_fg
    foreground pixels (reference classmap contract,
    ManualAnnoDatasetv2.py:229-238)."""
    label_files = sorted(glob.glob(os.path.join(label_dir, "label_*.nii.gz")))
    for min_fg in min_fg_list:
        cmap = {name: {} for name in label_names}
        for f in label_files:
            sid = re.findall(r"\d+", os.path.basename(f))[-1]
            lb = read_nii(f)
            for cls, name in enumerate(label_names):
                counts = (lb == cls).reshape(lb.shape[0], -1).sum(axis=1)
                cmap[name][sid] = [int(z) for z in
                                   np.nonzero(counts >= min_fg)[0]]
        with open(os.path.join(out_dir, f"classmap_{min_fg}.json"),
                  "w") as fp:
            json.dump(cmap, fp)


def prepare_dataset(in_dir: str, out_dir: str, modality: str,
                    label_names: list[str], image_size: int = 672,
                    new_spacing=(1.25, 1.25, 7.70),
                    fg_thresh: float = 1e-4):
    """Full prep pipeline for a directory of image_*/label_* NIfTI pairs."""
    os.makedirs(out_dir, exist_ok=True)
    fg_thresh = fg_thresh + (50 if modality == "MR" else 0)
    for img_fid in sorted(glob.glob(os.path.join(in_dir, "image_*.nii.gz"))):
        sid = re.findall(r"\d+", os.path.basename(img_fid))[-1]
        img = read_nii(img_fid, peel_info=False)
        lb = read_nii(os.path.join(in_dir, f"label_{sid}.nii.gz"),
                      peel_info=False)
        if modality == "MR":
            img.array = normalize_mr(img.array)
        img = resample_volume(img, new_spacing)
        lb = resample_volume(lb, new_spacing, is_label=True)
        # in-plane resize to the target resolution
        rs = lambda a, order: np.stack(
            [cv2.resize(a[i].astype(np.float32), (image_size, image_size),
                        interpolation=order) for i in range(a.shape[0])])
        img.array = rs(img.array, cv2.INTER_LINEAR)
        lb.array = rs(lb.array, cv2.INTER_NEAREST)
        write_nii(img, os.path.join(out_dir, f"image_{sid}.nii.gz"))
        write_nii(lb, os.path.join(out_dir, f"label_{sid}.nii.gz"))
        sp = superpix_volume(img.array, fg_thresh)
        write_nii(NiftiImage(sp.astype(np.int16), img.spacing, img.origin,
                             img.direction),
                  os.path.join(out_dir, f"superpix-MIDDLE_{sid}.nii.gz"))
    build_classmaps(out_dir, out_dir, label_names)
