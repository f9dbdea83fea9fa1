#!/usr/bin/env python3
"""Measure the CCA Pallas fixpoint's actual iteration counts on chip.

The kernel's while_loop exits on convergence (ops/cca_pallas._kernel); this
probes how many iterations bench-like smooth anatomy masks, serpentine
worst cases, and speckle masks really take at 1024² — sizing how much of
the ~43 ms/batch-24 CCA stage is the verify overhead vs real propagation.

Usage: python tools/probe_cca_iters.py [n_masks]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from protosam_tpu.ops.cca_pallas import _call
    from tools.bench_cca import make_masks

    masks = make_masks(n)
    kinds = ["anatomy", "serpentine", "speckle"]
    for i in range(n):
        lbl, iters = _call(jnp.asarray(masks[i], jnp.int32), False, 1024, True)
        ncc = int(jnp.sum((lbl.reshape(-1) == jnp.arange(masks[i].size))
                          & (lbl.reshape(-1) < 2**30)))
        print(f"mask {i} ({kinds[i % 3]:10s}): iters={int(iters[0, 0])}"
              f"  components={ncc}", flush=True)


if __name__ == "__main__":
    main()
