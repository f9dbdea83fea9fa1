"""Pairing machinery + full-scan support modes on synthetic data."""

import numpy as np
import pytest

from protosam_tpu.data.medical import MedicalVolumeDataset
from protosam_tpu.data.pairing import (
    ReloadPairedDataset,
    Subset,
    fewshot_pairing,
    med_fewshot,
)
from protosam_tpu.data.simple import SimpleDataset
from protosam_tpu.data.superpixel import SuperpixelDataset

from tests.synthetic_data import HW, NZ, make_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_dataset(str(tmp_path_factory.mktemp("chaos_pair")))


def test_subset_and_paired(data_dir):
    ds = SuperpixelDataset("CHAOST2", data_dir, idx_split=0, mode="val",
                           image_size=HW, transforms=None, seed=0)
    # flatten the episode dicts into plain image/label samples for pairing
    class Flat:
        def __len__(self):
            return len(ds.actual_dataset)

        def __getitem__(self, i):
            r = ds.actual_dataset[i]
            return {"image": r["img"].transpose(2, 0, 1),
                    "label": r["lb"][..., 0]}

    flat = Flat()
    sub = Subset(flat, [0, 1, 2], class_id=1)
    assert len(sub) == 3 and sub[0]["basic_class_id"] == 1

    paired = ReloadPairedDataset([sub], n_elements=[2],
                                 curr_max_iters=5, seed=0)
    assert len(paired) == 5
    ep = paired[0]
    assert len(ep) == 2
    episode = fewshot_pairing(ep, n_ways=1, n_shots=1, cnt_query=[1])
    assert len(episode["support_images"][0]) == 1
    assert len(episode["query_images"]) == 1
    assert set(np.unique(episode["query_labels"][0])) <= {0.0, 1.0, 255.0}
    paired.update_index()  # reshuffle


def test_med_fewshot_stream(data_dir):
    parent = MedicalVolumeDataset("CHAOST2", data_dir, idx_split=0,
                                  image_size=HW)
    stream = med_fewshot(parent, max_iters_per_load=4, seed=0)
    assert len(stream) == 4
    ep = stream[0]
    assert len(ep["support_images"][0]) == 1


def test_get_support_scan_and_full_scan(data_dir):
    parent = MedicalVolumeDataset("CHAOST2", data_dir, idx_split=0,
                                  image_size=HW)
    sup = parent.get_support_scan(curr_class=2, class_idx=[2], scan_idx=[-1])
    assert sup["support_images"][0][0].shape == (NZ, 3, HW, HW)
    assert sup["support_mask"][0][0]["fg_mask"].shape == (NZ, HW, HW)

    multi = parent.get_support_multiple_classes([2, 3], [-1], npart=3)
    assert len(multi["support_images"]) == 2      # one way-list per class
    assert len(multi["support_images"][0]) == 3   # 3 chunks each

    scan = parent.get_scan(0)
    assert scan["image"].shape == (3, NZ, HW, HW)
    assert scan["label"].shape == (NZ, HW, HW)


def test_simple_dataset():
    ds = SimpleDataset([1, 2, 3], loops=2)
    assert len(ds) == 6 and ds[4] == 2
