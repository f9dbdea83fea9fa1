"""SSL superpixel polyp episodes with on-the-fly native Felzenszwalb."""

import os

import cv2
import numpy as np
import pytest

from protosam_tpu.data.polyp import SuperpixPolypDataset


@pytest.fixture(scope="module")
def polyp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("polyps_ssl")
    rng = np.random.default_rng(1)
    ds = "Kvasir"
    os.makedirs(root / ds / "images")
    os.makedirs(root / ds / "masks")
    names = [f"k_{i}" for i in range(3)]
    for n in names:
        img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
        cv2.circle(img, (48, 48), 22, (220, 60, 60), -1)
        mask = np.zeros((96, 96), np.uint8)
        cv2.circle(mask, (48, 48), 20, 255, -1)
        cv2.imwrite(str(root / ds / "images" / f"{n}.png"), img)
        cv2.imwrite(str(root / ds / "masks" / f"{n}.png"), mask)
    with open(root / ds / "split.txt", "w") as f:
        f.write("train:\n" + "\n".join(names) + "\nval:\ntest:\n")
    return str(root)


def test_superpix_polyp_episode(polyp_root):
    ds = SuperpixPolypDataset(polyp_root, train=True, image_size=128,
                              seed=0, datasets=("Kvasir",))
    ep = ds[0]
    assert ep["support_images"][0][0].shape == (3, 128, 128)
    assert ep["query_images"][0].shape == (3, 128, 128)
    fg = ep["support_mask"][0][0]["fg_mask"]
    assert fg.shape == (128, 128)
    assert fg.sum() > 0
