"""Synthetic CHAOST2-like dataset for integration tests.

Generates NIfTI volumes with ellipsoid 'organs' (labels 1..4), superpixel
maps, and the classmap JSONs the datasets expect.
"""

import json
import os

import numpy as np

from protosam_tpu.data.nifti import NiftiImage, write_nii

N_SCANS = 20        # CHAOST2 _SEP needs 20 scan ids
HW = 64
NZ = 6


def _volume(rng, scan: int):
    img = rng.normal(100, 20, (NZ, HW, HW)).astype(np.float32)
    lbl = np.zeros((NZ, HW, HW), np.int16)
    zz, yy, xx = np.mgrid[:NZ, :HW, :HW]
    centers = {1: (24, 20), 2: (40, 44), 3: (20, 44), 4: (44, 20)}
    for cls, (cy, cx) in centers.items():
        r = 7 + (scan + cls) % 3
        blob = (((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r) & (zz >= 1) & (zz < NZ - 1)
        lbl[blob] = cls
        img[blob] += 80 + 10 * cls
    # superpixels: a coarse grid partition (ids 1..16) per slice
    sp = (yy // (HW // 4) * 4 + xx // (HW // 4) + 1).astype(np.int16)
    return img, lbl, sp


def make_dataset(base_dir: str, seed: int = 0):
    os.makedirs(base_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    classmap = {name: {} for name in ["BG", "LIVER", "RK", "LK", "SPLEEN"]}
    names = ["BG", "LIVER", "RK", "LK", "SPLEEN"]
    for scan in range(1, N_SCANS + 1):
        sid = str(scan)
        img, lbl, sp = _volume(rng, scan)
        write_nii(NiftiImage(img, (1.5, 1.5, 5.0)),
                  f"{base_dir}/image_{sid}.nii.gz")
        write_nii(NiftiImage(lbl, (1.5, 1.5, 5.0)),
                  f"{base_dir}/label_{sid}.nii.gz")
        write_nii(NiftiImage(sp, (1.5, 1.5, 5.0)),
                  f"{base_dir}/superpix-MIDDLE_{sid}.nii.gz")
        for cls in range(1, 5):
            zlist = sorted(int(z) for z in
                           np.unique(np.where(lbl == cls)[0]))
            classmap[names[cls]][sid] = zlist
        classmap["BG"][sid] = list(range(NZ))
    for fname in ["classmap_1.json", "classmap_100.json"]:
        with open(os.path.join(base_dir, fname), "w") as f:
            json.dump(classmap, f)
    return base_dir
