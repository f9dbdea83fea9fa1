"""Checkpoint save/load (orbax) + torch-snapshot interop.

Reference behavior: plain ``torch.save(state_dict)`` snapshots every 25k
iters and strict reload (training.py:235-238, grid_proto_fewshot.py:41-44).
Here: orbax for native (params + opt state + step) checkpoints with resume,
plus loaders that accept the reference's ``.pth`` files via torch_convert.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_params(path: str, params: Any):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any | None = None) -> Any:
    """Load params saved by save_params, or a torch ``.pth`` (auto-detected
    by extension) converted on the fly."""
    if path.endswith((".pth", ".pt")):
        return load_torch_snapshot(path)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree.map(np.asarray, template)
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))


def load_torch_snapshot(path: str) -> Any:
    """Convert a reference ALPNet/SAM torch snapshot into flax params.

    ALPNet snapshots prefix encoder weights with ``encoder.`` — DINOv2 and
    SAM key layouts are auto-detected.
    """
    import torch

    from protosam_tpu.utils.torch_convert import (
        convert_deeplab_resnet101,
        convert_dinov2,
        convert_sam,
    )

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    keys = list(sd.keys())
    if any(k.startswith("image_encoder.") for k in keys):
        return convert_sam(sd)
    if any(k.startswith("encoder.") for k in keys):
        enc = {k[len("encoder."):]: v for k, v in sd.items()
               if k.startswith("encoder.")}
        if any(k.startswith(("backbone.", "localconv.")) for k in enc):
            return {"encoder": convert_deeplab_resnet101(enc)}
        return {"encoder": convert_dinov2(enc)}
    if any(k.startswith(("backbone.", "localconv.")) for k in keys):
        return {"encoder": convert_deeplab_resnet101(sd)}
    return convert_dinov2(sd)


class CheckpointManager:
    """Rolling training checkpoints with resume (orbax CheckpointManager)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self.mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, step: int | None = None):
        import orbax.checkpoint as ocp

        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def wait(self):
        self.mngr.wait_until_finished()
