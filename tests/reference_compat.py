"""Import helpers for running the PyTorch reference on CPU in golden tests.

The reference lives read-only at /root/reference and is CUDA-centric; we
monkeypatch ``.cuda()`` to a no-op (see conftest) and import only the modules
that need nothing beyond torch/numpy.
"""

import sys

REFERENCE_ROOT = "/root/reference"


def import_reference_alpmodule():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import alpmodule  # noqa
    return alpmodule


def import_reference_protosam():
    """Import the reference's full ProtoSAM pipeline module on CPU.

    models/ProtoSAM.py transitively needs packages absent here (torchvision,
    pip segment_anything, kneed, sklearn) — none of which participate in the
    point/bbox/cca forward path this test exercises.  We mount the VENDORED
    models/segment_anything as the top-level ``segment_anything`` package and
    stub the rest:

    * ``torchvision.transforms.functional.resize/to_pil_image`` — only
      reached via ResizeLongestSide.apply_image on an already-target-size
      image, i.e. an identity; the stub asserts that and passes through.
    * ``kneed`` / ``sklearn`` — imported by util.utils at module level, used
      only by legacy helpers the forward never calls.
    * ``models.grid_proto_fewshot`` — the coarse model is replaced by a stub
      wrapper in the test anyway.
    """
    import importlib.util
    import types

    import numpy as np

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    def _ensure(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        parent, _, child = name.rpartition(".")
        if parent:
            setattr(_ensure(parent), child, m)
        return m

    def _identity_resize(img, size):
        arr = np.asarray(img)
        assert arr.shape[:2] == tuple(size), (
            "stubbed torchvision resize supports only the identity case "
            f"(got {arr.shape[:2]} -> {tuple(size)})")
        return arr

    _ensure("torchvision")
    _ensure("torchvision.transforms")
    _ensure("torchvision.transforms.functional",
            resize=_identity_resize, to_pil_image=lambda x: x)
    _ensure("torchvision.ops")
    _ensure("torchvision.ops.boxes", batched_nms=None, box_area=None)
    _ensure("kneed", KneeLocator=object)
    _ensure("sklearn")
    _ensure("sklearn.decomposition", PCA=object)
    # vendored SAM as the top-level package (after the torchvision stubs,
    # which its transforms module imports)
    if "segment_anything" not in sys.modules:
        root = f"{REFERENCE_ROOT}/models/segment_anything"
        spec = importlib.util.spec_from_file_location(
            "segment_anything", f"{root}/__init__.py",
            submodule_search_locations=[root])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["segment_anything"] = mod
        spec.loader.exec_module(mod)

        # The reference RUNTIME resolves `segment_anything` to the pip
        # package (requirements.txt:57, segment-anything==1.0), whose
        # Sam.postprocess_masks is upstream BILINEAR; the vendored fork we
        # mount here changed it to nearest (modeling/sam.py:154-160, used
        # only by SamWrapper).  Restore upstream semantics so the harness
        # emulates what ProtoSAM actually runs.
        import torch
        import torch.nn.functional as _F

        def _upstream_postprocess(self, masks, input_size, original_size):
            masks = _F.interpolate(
                masks, (self.image_encoder.img_size,) * 2, mode="bilinear",
                align_corners=False)
            masks = masks[..., :input_size[0], :input_size[1]]
            return _F.interpolate(masks, original_size, mode="bilinear",
                                  align_corners=False)

        mod.modeling.sam.Sam.postprocess_masks = _upstream_postprocess

    # import the REAL models package first so the stub below doesn't shadow it
    import importlib

    importlib.import_module("models")
    _ensure("models.grid_proto_fewshot", FewShotSeg=object)

    import matplotlib
    matplotlib.use("Agg")

    from models import ProtoSAM  # noqa
    return ProtoSAM


def import_sam_modeling():
    """Load the reference's segment_anything.modeling subpackage standalone.

    The parent package's __init__ imports the (uninstalled) pip
    ``segment_anything``, so we mount ``modeling`` as its own top-level
    package instead.
    """
    import importlib.util

    name = "ref_sam_modeling"
    if name in sys.modules:
        return sys.modules[name]
    root = f"{REFERENCE_ROOT}/models/segment_anything/modeling"
    spec = importlib.util.spec_from_file_location(
        name, f"{root}/__init__.py", submodule_search_locations=[root])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
