#!/usr/bin/env python3
"""ProtoSAM evaluation entry point (reference validation_protosam.py).

Usage (sacred-style, same surface as the reference launch scripts):
    python3 validation_protosam.py with modelname=dinov2_l14 \
        protosam_sam_ver=sam_h dataset=CHAOST2_Superpix_672 curr_cls=rk \
        eval_fold=0 "input_size=(672, 672)" do_cca=True support_idx=[4]
"""

import json
import logging
import sys

from protosam_tpu.eval.protosam_eval import run_eval
from protosam_tpu.utils.config import load_config


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    result = run_eval(cfg)
    print(json.dumps({k: v for k, v in result.items() if k != "cases"},
                     indent=2))
    return result


if __name__ == "__main__":
    main()
