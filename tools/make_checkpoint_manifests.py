#!/usr/bin/env python3
"""Generate committed key->shape manifests for the real checkpoint layouts
the reference loads (VERDICT r4 #6).

Two manifests, written under tests/goldens/manifests/:

* ``sam_vit_h_keys.json`` — the exact state_dict of the reference's own
  ``build_sam_vit_h()`` (models/segment_anything/build_sam.py:14-30),
  instantiated on the torch meta device (no weights, no download).  This IS
  the key layout of the public sam_vit_h_4b8939.pth.
* ``dinov2_vitl14_hub_keys.json`` — the torch.hub ``dinov2_vitl14`` layout
  (the encoder the reference selects at grid_proto_fewshot.py:54-58),
  derived INDEPENDENTLY from HuggingFace's ``Dinov2Model`` architecture at
  the dinov2-large geometry, mapped through
  ``hf_dinov2_to_hub_state_dict`` (HF mirrors the same weights under
  different names).  Cross-derivation makes the committed layout more than
  a restatement of our own converter's expectations.

Run on a torch-capable host::

    python tools/make_checkpoint_manifests.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "manifests")


def sam_vit_h_manifest() -> dict:
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_sam_checkpoint_shapes import _load_build_sam

    build = _load_build_sam()
    with torch.device("meta"):
        ref = build.build_sam_vit_h()
    return {k: list(v.shape) for k, v in ref.state_dict().items()}


def dinov2_vitl14_hub_manifest() -> dict:
    """Derive the hub layout from HF's Dinov2 architecture (meta device)."""
    import numpy as np
    import torch
    from transformers import Dinov2Config, Dinov2Model

    from protosam_tpu.utils.torch_convert import hf_dinov2_to_hub_state_dict

    cfg = Dinov2Config(hidden_size=1024, num_hidden_layers=24,
                       num_attention_heads=16, mlp_ratio=4,
                       image_size=518, patch_size=14)
    with torch.device("meta"):
        model = Dinov2Model(cfg)
    # zeros at the meta shapes -> run the HF->hub name mapping for real
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in model.state_dict().items()}
    hub = hf_dinov2_to_hub_state_dict(sd)
    return {k: list(np.asarray(v).shape) for k, v in hub.items()}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in (("sam_vit_h_keys.json", sam_vit_h_manifest),
                     ("dinov2_vitl14_hub_keys.json",
                      dinov2_vitl14_hub_manifest)):
        path = os.path.join(OUT_DIR, name)
        manifest = fn()
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"{path}: {len(manifest)} keys")


if __name__ == "__main__":
    main()
