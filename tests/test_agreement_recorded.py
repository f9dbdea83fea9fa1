"""The executed ≥0.99-Dice acceptance criterion (BASELINE.json).

``tests/goldens/ref_masks/`` holds masks RECORDED from the PyTorch
reference's actual ``ProtoSAM.forward`` (models/ProtoSAM.py:536-678) by
``tools/record_reference_masks.py --synthetic`` — seeded tiny SAM weights,
deterministic analytic inputs (tests/reference_compat.py).  This test
replays the SAME inputs through our jitted pipeline with the SAME converted
weights and pairs the masks via the agreement harness
(protosam_tpu.utils.agreement.dice_agreement_report), asserting the
committed acceptance bar end-to-end:

* torch is NOT needed to produce our side — only to rebuild the seeded
  reference weights for conversion;
* any stage-wiring regression (resize order, frame conventions, CCA/prompt
  math, decode batching) breaks the pairing against masks recorded BEFORE
  the change, which the live golden test (test_pipeline_golden) cannot do.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "ref_masks")


@pytest.fixture(scope="module")
def our_pipeline_params():
    from tests.reference_compat import build_tiny_torch_sam

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.utils.torch_convert import convert_sam

    our_sam = build_sam("vit_t", image_size=256)
    our_params = convert_sam(build_tiny_torch_sam().state_dict())
    return our_sam, our_params


@pytest.mark.parametrize("tag,use_cca", [
    ("cca", True), ("all", False),
    # the remaining prompt-flag combinations of the reference forward
    # (models/ProtoSAM.py:266-466), recorded by the same tool
    ("conf2", True), ("centroid", True), ("neg", True), ("mask", True),
])
def test_recorded_agreement(our_pipeline_params, tmp_path, tag, use_cca):
    from tests.reference_compat import synthetic_agreement_case

    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
    from protosam_tpu.utils.agreement import dice_agreement_report

    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as f:
        manifest = json.load(f)
    cfg = manifest["configs"][tag]
    assert cfg["use_cca"] == use_cca

    our_sam, our_params = our_pipeline_params
    pipe = ProtoSAM(None, None, our_sam, our_params,
                    ProtoSAMConfig(image_size=(256, 256), max_ccs=8,
                                   use_cca=use_cca,
                                   use_points=cfg["use_points"],
                                   use_bbox=cfg["use_bbox"],
                                   use_mask=cfg["use_mask"],
                                   use_neg_points=cfg["use_neg_points"],
                                   point_mode=cfg["point_mode"],
                                   num_points_for_sam=cfg["num_points_for_sam"],
                                   # the goldens were recorded through the
                                   # reference's uint8 cast of the mask
                                   # prompt (ProtoSAM.py:479)
                                   mask_prompt_uint8_wrap=cfg["use_mask"]))
    ours_dir = tmp_path / tag
    ours_dir.mkdir()
    for i, name in enumerate(cfg["files"]):
        qry, logits = synthetic_agreement_case(i)
        pred, _scores, _ = pipe._jit_refine(our_params, jnp.asarray(qry),
                                            jnp.asarray(logits))
        np.save(ours_dir / name, (np.asarray(pred) > 0).astype(np.uint8))

    report = dice_agreement_report(str(ours_dir), GOLDEN_DIR,
                                   pattern=f"syn_{tag}_*.npy")
    assert report["n_pairs"] == len(cfg["files"])
    assert not report["missing_in_ours"]
    assert report["passes_099"], report
    # the non-empty slices should agree near-exactly, not just at the bar
    non_trivial = [d for n, d in report["per_scan"].items()
                   if np.load(os.path.join(GOLDEN_DIR, n)).sum() > 0]
    if non_trivial:
        assert min(non_trivial) >= 0.99, report["per_scan"]


def test_recorded_masks_cover_all_paths():
    """The committed golden set exercises single-CC, multi-CC and
    empty-coarse-pred slices (manifest sanity — guards against re-recording
    with degenerate inputs)."""
    from tests.reference_compat import AGREEMENT_BLOBS

    n_ccs = [len(b) for b in AGREEMENT_BLOBS]
    assert 0 in n_ccs and 1 in n_ccs and max(n_ccs) >= 2
    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as f:
        manifest = json.load(f)
    for cfg in manifest["configs"].values():
        assert len(cfg["files"]) == len(AGREEMENT_BLOBS)
        for name in cfg["files"]:
            assert os.path.exists(os.path.join(GOLDEN_DIR, name))
