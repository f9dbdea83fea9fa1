#!/usr/bin/env python3
"""Quickstart: one-shot segmentation of a query slice from a single
annotated support slice.

Runs anywhere (CPU included) with tiny random-weight models; swap in
``dinov2_l14`` / ``vit_h`` and ``reload_model_path`` checkpoints for real
results.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.io_protocol import ALPNetInput
from protosam_tpu.models.sam import build_sam
from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig


def main():
    img = 126                      # use 672 for the real configs
    rng = jax.random.PRNGKey(0)

    # 1. models (tiny variants so this demo runs in seconds)
    coarse = FewShotSeg(image_size=img, which_model="dinov2_t14")
    sam = build_sam("vit_t", image_size=256)

    # 2. a synthetic support/query pair: a bright blob is the "organ"
    def slice_with_blob(key, cy, cx):
        x = jax.random.normal(key, (1, 3, img, img)) * 0.1
        yy, xx = jnp.mgrid[:img, :img]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < 20 ** 2).astype(jnp.float32)
        return x + blob * 2.0, blob

    support, support_mask = slice_with_blob(jax.random.PRNGKey(1), 60, 55)
    query, query_gt = slice_with_blob(jax.random.PRNGKey(2), 66, 70)

    # 3. init params (or load_params("alpnet.pth") / load_sam_pth("sam.pth"))
    cp = coarse.init(rng, support, support_mask[None], 1 - support_mask[None],
                     query)["params"]
    sp = sam.init(rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
                  jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]

    # 4. the pipeline: coarse prototypes -> device CCA/prompts -> SAM
    pipe = ProtoSAM(coarse, cp, sam, sp,
                    ProtoSAMConfig(image_size=(256, 256), use_cca=True,
                                   max_ccs=4))
    inp = ALPNetInput(support, support_mask[None], query)
    pred, scores = pipe.forward(query, inp)

    inter = float(jnp.sum((pred > 0) & (query_gt > 0)))
    union = float(jnp.sum(pred) + jnp.sum(query_gt))
    print(f"pred fg pixels: {int(jnp.sum(pred))}, "
          f"dice vs synthetic gt: {2 * inter / max(union, 1):.3f}, "
          f"sam scores: {np.asarray(scores)}")


if __name__ == "__main__":
    main()
