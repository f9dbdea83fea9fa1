#!/usr/bin/env python3
"""ALPNet-only evaluation entry point (reference validation.py).

    python3 validation.py with modelname=dinov2_l14 dataset=CHAOST2 \
        eval_fold=0 label_sets=0 support_idx=[4] "input_size=(672, 672)"
"""

import json
import logging
import sys

from protosam_tpu.eval.alpnet_eval import run_alpnet_eval
from protosam_tpu.utils.config import load_config


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    result = run_alpnet_eval(cfg)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
