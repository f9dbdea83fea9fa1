#!/usr/bin/env python3
"""Run our eval and compare against recorded reference masks.

    python tools/run_agreement.py --ref-masks ./ref_masks \
        with modelname=dinov2_l14 dataset=CHAOST2 curr_cls=rk ... \
        reload_model_path=alpnet.pth

Writes our per-slice masks next to the log dir and prints the
dice-agreement report (target: overall >= 0.99, BASELINE.md).
"""

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-masks", required=True)
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from protosam_tpu.eval.protosam_eval import build_models, run_eval
    from protosam_tpu.utils.agreement import dice_agreement_report
    from protosam_tpu.utils.config import load_config

    cfg = load_config(args.rest)
    ours_dir = os.path.join(cfg.log_dir or ".", "our_masks")
    os.makedirs(ours_dir, exist_ok=True)

    # run_eval with per-slice mask dumping
    import protosam_tpu.eval.protosam_eval as pe

    orig_metric = pe.dice_iou_precision_recall
    counter = {"i": 0}

    def dump_and_score(pred, gt):
        np.save(os.path.join(ours_dir, f"slice_{counter['i']:05d}.npy"),
                np.asarray(pred))
        counter["i"] += 1
        return orig_metric(pred, gt)

    pe.dice_iou_precision_recall = dump_and_score
    try:
        run_eval(cfg)
    finally:
        pe.dice_iou_precision_recall = orig_metric

    report = dice_agreement_report(ours_dir, args.ref_masks, pattern="*.npy")
    print(json.dumps(report, indent=2))
    return 0 if report["passes_099"] else 1


if __name__ == "__main__":
    sys.exit(main())
