"""Full-size SAM vit_b checkpoint conversion: the converted tree must match
our model's init tree shape-for-shape (catches layout drift without needing
a forward pass)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam import build_sam
from protosam_tpu.utils.torch_convert import convert_sam

from tests.reference_compat import REFERENCE_ROOT, import_sam_modeling


def _load_build_sam():
    """Load the reference build_sam with its relative modeling import."""
    import_sam_modeling()
    name = "ref_sam_pkg"
    if name in sys.modules:
        return sys.modules[name + ".build_sam"]
    root = f"{REFERENCE_ROOT}/models/segment_anything"
    pkg_spec = importlib.util.spec_from_loader(
        name, loader=None, is_package=True)
    pkg = importlib.util.module_from_spec(pkg_spec)
    pkg.__path__ = [root]
    sys.modules[name] = pkg
    spec = importlib.util.spec_from_file_location(
        name + ".modeling", f"{root}/modeling/__init__.py",
        submodule_search_locations=[f"{root}/modeling"])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name + ".modeling"] = mod
    spec.loader.exec_module(mod)
    bspec = importlib.util.spec_from_file_location(
        name + ".build_sam", f"{root}/build_sam.py")
    b = importlib.util.module_from_spec(bspec)
    sys.modules[name + ".build_sam"] = b
    bspec.loader.exec_module(b)
    return b


def test_vit_b_checkpoint_tree_matches():
    build = _load_build_sam()
    with torch.device("meta"):
        try:
            ref = build.build_sam_vit_b()
        except Exception:
            ref = None
    if ref is None:
        ref = build.build_sam_vit_b()
        sd = {k: v for k, v in ref.state_dict().items()}
    else:
        sd = {k: torch.empty(v.shape) for k, v in ref.state_dict().items()}
    sd = {k: np.zeros(tuple(v.shape), np.float32) for k, v in sd.items()
          if not k.startswith(("pixel_mean", "pixel_std"))}

    converted = convert_sam(sd)

    sam = build_sam("vit_b")
    params = jax.eval_shape(
        lambda: sam.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 1024, 1024, 3)),
                         jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                         jnp.zeros((1, 4))))["params"]

    want = jax.tree.map(lambda a: tuple(a.shape), params)
    got = jax.tree.map(lambda a: tuple(np.asarray(a).shape), converted)
    assert want == got
