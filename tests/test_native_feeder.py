"""Native C++ NIfTI feeder vs the pure-python/cv2 reference path."""

import cv2
import numpy as np
import pytest

from protosam_tpu.data.nifti import NiftiImage, write_nii
from protosam_tpu.native import (
    native_available,
    preprocess_volume_native,
    read_volume_native,
)
from protosam_tpu.native.feeder import resize_labels_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no g++/zlib toolchain")


@pytest.fixture(scope="module")
def vol_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("nifti")
    rng = np.random.default_rng(0)
    arr = rng.normal(100, 25, (5, 40, 52)).astype(np.float32)
    write_nii(NiftiImage(arr, spacing=(1.5, 1.25, 5.0)), d / "v.nii.gz")
    write_nii(NiftiImage(arr.astype(np.int16), spacing=(1.5, 1.25, 5.0)),
              d / "v_i16.nii.gz")
    return d, arr


def test_read_matches_python(vol_path):
    d, arr = vol_path
    got, spacing = read_volume_native(str(d / "v.nii.gz"))
    np.testing.assert_allclose(got, arr, atol=1e-5)
    np.testing.assert_allclose(spacing, (1.5, 1.25, 5.0), atol=1e-5)
    got16, _ = read_volume_native(str(d / "v_i16.nii.gz"))
    np.testing.assert_allclose(got16, arr.astype(np.int16), atol=1e-5)


def test_preprocess_matches_cv2_mr(vol_path):
    _, arr = vol_path
    out = preprocess_volume_native(arr, 64, "MR")
    # python path: volume z-score then cv2 INTER_LINEAR per slice
    norm = (arr - arr.mean()) / arr.std()
    want = np.stack([cv2.resize(norm[i], (64, 64),
                                interpolation=cv2.INTER_LINEAR)
                     for i in range(arr.shape[0])])
    np.testing.assert_allclose(out, want, atol=2e-3, rtol=1e-3)


def test_preprocess_ct_stats(vol_path):
    _, arr = vol_path
    out = preprocess_volume_native(arr, 48, "CT", ct_mean=100.0, ct_std=25.0)
    want = np.stack([cv2.resize((arr[i] - 100.0) / 25.0, (48, 48),
                                interpolation=cv2.INTER_LINEAR)
                     for i in range(arr.shape[0])])
    np.testing.assert_allclose(out, want, atol=2e-3, rtol=1e-3)


def test_resize_nearest_matches_torch_semantics(vol_path):
    _, arr = vol_path
    lbl = (arr > 100).astype(np.float32)
    out = resize_labels_native(lbl, 64)
    # torch-legacy nearest: floor(i * in/out)
    rows = np.floor(np.arange(64) * lbl.shape[1] / 64).astype(int)
    cols = np.floor(np.arange(64) * lbl.shape[2] / 64).astype(int)
    want = lbl[:, rows][:, :, cols]
    np.testing.assert_array_equal(out, want)
