"""Polyp dataset tests on synthetic PNG data."""

import os

import cv2
import numpy as np
import pytest

from protosam_tpu.data.polyp import PolypDataset


@pytest.fixture(scope="module")
def polyp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("polyps")
    rng = np.random.default_rng(0)
    for ds in ["Kvasir", "CVC-ClinicDB"]:
        os.makedirs(root / ds / "images")
        os.makedirs(root / ds / "masks")
        names = [f"{ds.lower()}_{i}" for i in range(6)]
        for n in names:
            img = rng.integers(0, 255, (120, 150, 3)).astype(np.uint8)
            mask = np.zeros((120, 150), np.uint8)
            cy, cx = rng.integers(30, 90), rng.integers(40, 110)
            cv2.circle(mask, (int(cx), int(cy)), 20, 255, -1)
            cv2.imwrite(str(root / ds / "images" / f"{n}.png"), img)
            cv2.imwrite(str(root / ds / "masks" / f"{n}.png"), mask)
        with open(root / ds / "split.txt", "w") as f:
            f.write("train:\n" + "\n".join(names[:4]) +
                    "\nval:\n\ntest:\n" + "\n".join(names[4:]) + "\n")
    return str(root)


def test_polyp_splits(polyp_root):
    tr = PolypDataset(polyp_root, train=True, image_size=256, seed=0)
    te = PolypDataset(polyp_root, train=False, image_size=256, seed=0)
    assert len(tr) == 8 and len(te) == 4


def test_polyp_item_sam_trans(polyp_root):
    ds = PolypDataset(polyp_root, train=False, use_sam_trans=True,
                      image_size=256, seed=0)
    s = ds[0]
    assert s["image"].shape == (3, 256, 256)
    assert s["label"].shape == (256, 256)
    assert set(np.unique(s["label"])) <= {0.0, 1.0}
    # longest side 150 -> 256; pad rows below 256*120/150=204 must be zero
    assert s["image"][:, 210:, :].max() == 0


def test_polyp_support(polyp_root):
    ds = PolypDataset(polyp_root, train=True, use_sam_trans=True,
                      image_size=256, seed=0)
    sup_imgs, sup_gts, case = ds.get_support(n_support=2)
    assert len(sup_imgs) == 2
    assert sup_imgs[0].shape == (1, 3, 256, 256)
    assert sup_gts[0].shape == (1, 256, 256)


def test_polyp_support_from_text_file(polyp_root, tmp_path):
    ds = PolypDataset(polyp_root, train=True, use_sam_trans=True,
                      image_size=256, seed=0)
    lst = tmp_path / "support.txt"
    with open(lst, "w") as f:
        f.write(f"{ds.images[0]} {ds.gts[0]}\n{ds.images[1]} {ds.gts[1]}\n")
    sup_imgs, sup_gts, _ = ds.get_support(n_support=2, text_file=str(lst))
    assert len(sup_imgs) == 2 and sup_imgs[0].shape == (1, 3, 256, 256)
    import pytest
    with pytest.raises(ValueError):
        ds.get_support(n_support=5, text_file=str(lst))
