"""3-slice mode and CLAHE paths of the eval dataset."""

import numpy as np
import pytest

from protosam_tpu.data.medical import MedicalVolumeDataset

from tests.synthetic_data import HW, NZ, make_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_dataset(str(tmp_path_factory.mktemp("chaos_modes")))


def test_use_3_slices(data_dir):
    ds = MedicalVolumeDataset("CHAOST2", data_dir, idx_split=0,
                              image_size=HW, use_3_slices=True)
    s_mid = ds[1]
    assert s_mid["image"].shape == (3, HW, HW)
    # middle channel is the slice itself; neighbors differ
    assert not np.allclose(s_mid["image"][0], s_mid["image"][1])
    s_first = ds[0]
    # first slice: previous-neighbor channel is zeros (reference
    # get_3_slice_adjacent_image, ManualAnnoDatasetv2.py:280-295)
    assert s_first["is_start"] and s_first["image"][0].max() == 0
    s_last = ds[NZ - 1]
    assert s_last["is_end"] and s_last["image"][2].max() == 0


def test_use_clahe(data_dir):
    ds = MedicalVolumeDataset("CHAOST2", data_dir, idx_split=0,
                              image_size=HW, use_clahe=True)
    s = ds[1]
    assert s["image"].shape == (3, HW, HW)
    assert np.isfinite(s["image"]).all()
