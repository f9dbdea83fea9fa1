import numpy as np

import jax.numpy as jnp

from protosam_tpu.data.nifti import NiftiImage, write_nii
from protosam_tpu.data.prefetch import VolumePrefetcher, device_prefetch
from protosam_tpu.utils.agreement import dice, dice_agreement_report


def test_device_prefetch_order():
    batches = [{"x": np.full((4,), i)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0]) == i
        assert isinstance(b["x"], jnp.ndarray)


def test_volume_prefetcher():
    def produce(i):
        if i >= 3:
            return None
        return np.full((2, 2), i, np.float32)

    out = list(VolumePrefetcher(produce, n_steps=10, depth=2))
    assert len(out) == 3
    assert float(out[2][0, 0]) == 2.0


def test_dice_and_agreement(tmp_path, rng):
    assert dice(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    a = rng.random((8, 8)) > 0.5
    assert dice(a, a) == 1.0

    ours, ref = tmp_path / "ours", tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    m = (rng.random((3, 16, 16)) > 0.6).astype(np.uint8)
    for d in (ours, ref):
        write_nii(NiftiImage(m, (1, 1, 1)), d / "scan_1_label_2.nii.gz")
    m2 = m.copy()
    m2[0, 0, 0] ^= 1
    write_nii(NiftiImage(m, (1, 1, 1)), ours / "scan_2_label_2.nii.gz")
    write_nii(NiftiImage(m2, (1, 1, 1)), ref / "scan_2_label_2.nii.gz")

    rep = dice_agreement_report(str(ours), str(ref))
    assert rep["n_pairs"] == 2
    assert rep["per_scan"]["scan_1_label_2.nii.gz"] == 1.0
    assert 0.98 < rep["per_scan"]["scan_2_label_2.nii.gz"] < 1.0
    assert rep["passes_099"]
