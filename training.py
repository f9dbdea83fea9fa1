#!/usr/bin/env python3
"""Episodic self-supervised training entry point (reference training.py).

    python3 training.py with dataset=CHAOST2_Superpix modelname=dlfcn_res101 \
        eval_fold=0 "exclude_cls_list=[2, 3]" n_steps=100100
"""

import logging
import sys

from protosam_tpu.train.trainer import train
from protosam_tpu.utils.config import load_config


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    out = train(cfg)
    print(f"training done at step {int(out['state'].step)}")
    return out


if __name__ == "__main__":
    main()
