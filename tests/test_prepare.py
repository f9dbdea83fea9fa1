"""Offline data-prep pipeline: native Felzenszwalb + resampling + classmaps."""

import json
import os

import numpy as np
import pytest

from protosam_tpu.data.nifti import NiftiImage, read_nii, write_nii
from protosam_tpu.data.prepare import (
    build_classmaps,
    felzenszwalb,
    fg_mask_2d,
    prepare_dataset,
    resample_volume,
    superpix_volume,
)


def test_felzenszwalb_segments_blobs():
    img = np.zeros((80, 80), np.float32)
    img[10:35, 10:35] = 10.0
    img[45:75, 45:75] = 20.0
    seg = felzenszwalb(img, scale=1.0, sigma=0.8, min_size=100)
    # a handful of regions (bg fragments + two blobs), blobs internally
    # uniform; with scale=1 the smoothed boundary rings fragment like
    # skimage's output does
    ids = np.unique(seg)
    assert 2 <= len(ids) <= 20
    blob1 = seg[15:30, 15:30]
    assert len(np.unique(blob1)) == 1
    blob2 = seg[50:70, 50:70]
    assert len(np.unique(blob2)) == 1
    assert blob1[0, 0] != blob2[0, 0]
    # min_size respected
    for i in ids:
        assert (seg == i).sum() >= 100


def test_fg_mask_and_superpix_volume():
    vol = np.zeros((2, 64, 64), np.float32)
    vol[:, 16:48, 16:48] = 100.0
    sp = superpix_volume(vol, fg_thresh=50.0, min_size=50)
    assert sp.shape == vol.shape
    assert sp[0][0, 0] == 0                     # background zeroed
    assert sp[0][20:40, 20:40].min() >= 1       # fg covered by superpixels


def test_resample_volume_changes_spacing():
    arr = np.random.default_rng(0).normal(size=(4, 32, 32)).astype(np.float32)
    img = NiftiImage(arr, spacing=(2.0, 2.0, 10.0))
    out = resample_volume(img, (1.0, 1.0, 10.0))
    assert out.array.shape == (4, 64, 64)
    lbl = NiftiImage((arr > 0).astype(np.int16), spacing=(2.0, 2.0, 10.0))
    lout = resample_volume(lbl, (1.0, 1.0, 10.0), is_label=True)
    assert set(np.unique(lout.array)) <= {0, 1}


def test_prepare_dataset_end_to_end(tmp_path):
    indir, outdir = tmp_path / "in", tmp_path / "out"
    os.makedirs(indir)
    rng = np.random.default_rng(0)
    for sid in [1, 2]:
        img = rng.normal(50, 10, (3, 48, 48)).astype(np.float32)
        lbl = np.zeros((3, 48, 48), np.int16)
        img[:, 10:35, 10:35] += 150
        lbl[:, 14:30, 14:30] = 1
        write_nii(NiftiImage(img, (2.5, 2.5, 7.7)),
                  indir / f"image_{sid}.nii.gz")
        write_nii(NiftiImage(lbl, (2.5, 2.5, 7.7)),
                  indir / f"label_{sid}.nii.gz")
    prepare_dataset(str(indir), str(outdir), "MR", ["BG", "ORGAN"],
                    image_size=64, new_spacing=(1.25, 1.25, 7.7))
    for sid in [1, 2]:
        assert (outdir / f"image_{sid}.nii.gz").exists()
        assert (outdir / f"superpix-MIDDLE_{sid}.nii.gz").exists()
        sp = read_nii(outdir / f"superpix-MIDDLE_{sid}.nii.gz")
        assert sp.shape[-1] == 64
    cmap = json.load(open(outdir / "classmap_1.json"))
    assert set(cmap) == {"BG", "ORGAN"}
    assert cmap["ORGAN"]["1"] == [0, 1, 2]
