"""Data layer + full eval driver integration tests on synthetic volumes."""

import numpy as np
import pytest

import jax.numpy as jnp

from protosam_tpu.data.medical import med_fewshot_val
from protosam_tpu.data.nifti import NiftiImage, read_nii, write_nii
from protosam_tpu.data.superpixel import SuperpixelDataset
from protosam_tpu.data.transforms import get_aug, transform_with_label
from protosam_tpu.utils.config import Config, load_config
from protosam_tpu.utils.metrics import Metric, dice_iou_precision_recall

from tests.synthetic_data import HW, NZ, make_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_dataset(str(tmp_path_factory.mktemp("chaos")))


def test_nifti_roundtrip(tmp_path):
    arr = np.random.default_rng(0).normal(size=(4, 8, 9)).astype(np.float32)
    img = NiftiImage(arr, spacing=(1.0, 2.0, 3.0), origin=(5.0, 6.0, 7.0))
    write_nii(img, tmp_path / "t.nii.gz")
    back = read_nii(tmp_path / "t.nii.gz", peel_info=False)
    np.testing.assert_allclose(back.array, arr, atol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-5)
    # int dtype path
    write_nii(NiftiImage(arr.astype(np.int16), (1, 1, 1)), tmp_path / "i.nii")
    np.testing.assert_array_equal(read_nii(tmp_path / "i.nii"),
                                  arr.astype(np.int16))


def test_validation_dataset_and_support(data_dir):
    val, parent = med_fewshot_val("CHAOST2", data_dir, idx_split=0,
                                  act_labels=[1, 2, 3, 4], npart=3,
                                  image_size=HW)
    # fold 0: scans 1..4 + 1 support candidate
    assert len(parent.pid_curr_load) == 5
    val.set_curr_cls(2)
    s = val[parent.scan_z_idx[parent.pid_curr_load[0]][2]]
    assert s["image"].shape == (3, HW, HW)
    assert set(np.unique(s["label"])) <= {0.0, 1.0}
    assert 0 <= s["part_assign"] < 3

    sup = val.get_support_set({"support_idx": [-1],
                               "task": {"npart": 3}})
    assert len(sup["support_images"]) == 3
    assert sup["support_images"][0].shape == (1, 3, HW, HW)
    assert sup["support_labels"][0].shape == (1, HW, HW)
    assert sup["support_labels"][0].max() == 1.0


def test_superpixel_episode(data_dir):
    aug = get_aug("sabs_aug", HW)
    tr = transform_with_label(aug, rng=np.random.RandomState(0))
    ds = SuperpixelDataset("CHAOST2", data_dir, idx_split=0, mode="train",
                           image_size=HW, transforms=tr, seed=0)
    assert len(ds) > 0
    ep = ds[1]
    assert ep["support_images"][0][0].shape == (3, HW, HW)
    assert ep["query_images"][0].shape == (3, HW, HW)
    fg = ep["support_mask"][0][0]["fg_mask"]
    assert set(np.unique(fg)) <= {0.0, 1.0}
    assert ep["query_labels"][0].shape == (HW, HW)


def test_metric_accumulator():
    m = Metric(max_label=4, n_scans=2)
    pred = np.zeros((8, 8)); pred[2:5, 2:5] = 1
    gt = np.zeros((8, 8)); gt[2:6, 2:6] = 1
    m.record(pred, gt, labels=[2], n_scan=0)
    m.record(pred, gt, labels=[2], n_scan=1)
    cls_mean, cls_std, mean, std = m.get_mDice(labels=[2])
    want = dice_iou_precision_recall(pred, gt)["dice"]
    np.testing.assert_allclose(mean, want, atol=1e-6)


def test_config_overrides():
    cfg = load_config(["with", "modelname=dinov2_l14", "do_cca=True",
                       "input_size=(672, 672)", "support_idx=[4]",
                       "curr_cls=rk", "eval_fold=0", "unknown_key=ignored"])
    assert cfg.modelname == "dinov2_l14"
    assert cfg.do_cca is True
    assert cfg.input_size == (672, 672)
    assert cfg.support_idx == [4]
    assert cfg.feature_hw == [48, 48]


def test_full_eval_driver(data_dir, monkeypatch):
    """The complete eval path: synthetic CHAOS fold -> support selection ->
    jitted pipeline (tiny models) -> per-case aggregation."""
    from protosam_tpu.eval.protosam_eval import build_models, run_eval

    cfg = Config()
    cfg.dataset = "CHAOST2"
    cfg.data_dirs = {"CHAOST2": data_dir}
    cfg.input_size = (HW, HW)
    cfg.modelname = "dinov2_t14"
    cfg.protosam_sam_ver = "vit_t"
    cfg.curr_cls = "rk"
    cfg.do_cca = True
    cfg.support_idx = [-1]
    cfg.dtype = "float32"
    cfg.slice_batch = 2
    cfg.max_ccs = 4
    cfg.log_dir = ""

    import protosam_tpu.models.sam.registry as reg
    # tiny SAM at 128² frame so the CPU test stays fast
    orig = reg.build_sam
    monkeypatch.setattr(reg, "build_sam",
                        lambda t, dtype, image_size=1024, **kw: orig(t, dtype, 128, **kw))
    import protosam_tpu.eval.protosam_eval as pe
    monkeypatch.setattr(pe, "build_sam",
                        lambda t, dtype, **kw: orig(t, dtype, 128, **kw))

    result = run_eval(cfg, mode="volume")
    assert 0.0 <= result["mar_val_batches_meanDice"] <= 1.0
    assert result["n_slices"] > 0
    assert len(result["cases"]) >= 3


def test_sam_oracle_eval(data_dir):
    """base_model=SAM oracle path: AMG best-vs-GT over the fold (driven
    with a perfect-oracle stub wrapper)."""
    import protosam_tpu.eval.protosam_eval as pe

    class FakeWrapper:
        def __call__(self, image, labels):
            return np.asarray(labels, np.float32)

    cfg = Config()
    cfg.dataset = "CHAOST2"
    cfg.data_dirs = {"CHAOST2": data_dir}
    cfg.input_size = (HW, HW)
    cfg.base_model = "SAM"
    cfg.curr_cls = "rk"
    cfg.log_dir = ""
    res = pe.run_eval_sam_oracle(cfg, wrapper=FakeWrapper())
    assert res["mar_val_batches_meanDice"] == pytest.approx(1.0, abs=1e-6)
    assert res["n_slices"] > 0


def test_eval_modes_agree(data_dir, monkeypatch):
    """volume mode and the faithful per-slice mode must produce the same
    metrics."""
    from protosam_tpu.eval.protosam_eval import run_eval

    cfg = Config()
    cfg.dataset = "CHAOST2"
    cfg.data_dirs = {"CHAOST2": data_dir}
    cfg.input_size = (HW, HW)
    cfg.modelname = "dinov2_t14"
    cfg.protosam_sam_ver = "vit_t"
    cfg.curr_cls = "lk"
    cfg.do_cca = True
    cfg.support_idx = [-1]
    cfg.dtype = "float32"
    cfg.slice_batch = 2
    cfg.max_ccs = 4
    cfg.log_dir = ""

    import protosam_tpu.models.sam.registry as reg
    import protosam_tpu.eval.protosam_eval as pe
    orig = reg.build_sam
    monkeypatch.setattr(pe, "build_sam",
                        lambda t, dtype, **kw: orig(t, dtype, 128, **kw))

    from protosam_tpu.eval.protosam_eval import build_models
    pipe = build_models(cfg)
    r_vol = run_eval(cfg, pipe=pipe, mode="volume")
    r_slc = run_eval(cfg, pipe=pipe, mode="per_slice")
    assert r_vol["n_slices"] == r_slc["n_slices"]
    # Wiring-level agreement, not bit-equality: under the 8-virtual-device
    # CPU test backend, XLA splits the encoder gemms across threads
    # differently for batch 1 vs batch 2 (measured 3e-6 on embeddings),
    # so the modes cannot be bitwise identical.  Mode-wiring bugs (frame /
    # resize-order / prompt mismatches) move Dice by >> 1e-3.
    np.testing.assert_allclose(r_vol["mar_val_batches_meanDice"],
                               r_slc["mar_val_batches_meanDice"], atol=1e-3)
