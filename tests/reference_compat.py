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


# ---------------------------------------------------------------------------
# Shared tiny-SAM + stub-coarse builders (golden test and the recording tool)
# ---------------------------------------------------------------------------

TINY_SAM_KW = dict(embed_dim=160, depth=2, num_heads=4,
                   global_attn_indexes=(1,), image_size=256)


def build_tiny_torch_sam(seed=11):
    """Tiny torch Sam structurally identical to our build_sam('vit_t', 256),
    with SEEDED weights — the shared fixture for the full-pipeline golden
    test and the synthetic reference-mask recording
    (tools/record_reference_masks.py)."""
    from functools import partial

    import torch

    m = import_sam_modeling()
    torch.manual_seed(seed)
    enc = m.image_encoder.ImageEncoderViT(
        img_size=256, patch_size=16, embed_dim=TINY_SAM_KW["embed_dim"],
        depth=TINY_SAM_KW["depth"], num_heads=TINY_SAM_KW["num_heads"],
        mlp_ratio=4.0, out_chans=256, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), use_rel_pos=True,
        window_size=14,
        global_attn_indexes=TINY_SAM_KW["global_attn_indexes"])
    pe = m.prompt_encoder.PromptEncoder(
        embed_dim=256, image_embedding_size=(16, 16),
        input_image_size=(256, 256), mask_in_chans=16)
    dec = m.mask_decoder.MaskDecoder(
        num_multimask_outputs=3,
        transformer=m.transformer.TwoWayTransformer(
            depth=2, embedding_dim=256, mlp_dim=2048, num_heads=8),
        transformer_dim=256)
    sam = m.sam.Sam(image_encoder=enc, prompt_encoder=pe, mask_decoder=dec,
                    pixel_mean=[123.675, 116.28, 103.53],
                    pixel_std=[58.395, 57.12, 57.375])
    sd = sam.state_dict()
    g = torch.Generator().manual_seed(42)
    for k, v in sd.items():
        scale = 0.05
        # A plain-random decoder produces mask logits with std ~0.004 —
        # every pixel sits at the 0 threshold and binary masks become pure
        # rounding noise.  Scaling the hypernetwork's FINAL layer gives the
        # logits real dynamic range (std ~0.25) so threshold flips only
        # happen at genuine mask boundaries; the conversion carries the
        # same weights to the flax side, so parity semantics are unchanged.
        if "output_hypernetworks_mlps" in k and ".layers.2." in k:
            scale = 3.2
        sd[k] = torch.randn(v.shape, generator=g) * scale
    sam.load_state_dict(sd)

    # The reference runtime drives the PIP predictor whose postprocess is
    # upstream BILINEAR; this Sam instance comes from the vendored fork,
    # which changed it to nearest (modeling/sam.py:154-160, SamWrapper-only).
    # Restore upstream semantics on the instance.
    import types
    import torch.nn.functional as F

    def _upstream_postprocess(self, masks, input_size, original_size):
        masks = F.interpolate(masks, (self.image_encoder.img_size,) * 2,
                              mode="bilinear", align_corners=False)
        masks = masks[..., :input_size[0], :input_size[1]]
        return F.interpolate(masks, original_size, mode="bilinear",
                             align_corners=False)

    sam.postprocess_masks = types.MethodType(_upstream_postprocess, sam)
    return sam.eval()


class StubSegmentationInput:
    """Minimal SegmentationInput: the coarse model is a stub, so only the
    set_query_images/to protocol needs to exist."""

    def set_query_images(self, q):
        pass

    def to(self, device):
        pass


class StubCoarseModel:
    """ModelWrapper stand-in returning precomputed coarse logits."""

    def __init__(self, logits):
        self.logits = logits

    def __call__(self, inp):
        return self.logits

    def eval(self):
        pass

    def to(self, device):
        pass


def synthetic_coarse_logits(rng, h, w, blobs):
    """Blobby two-class logits: each blob a gaussian bump of given gain."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    fg = np.full((h, w), -2.0, np.float32)
    for (cy, cx, r, gain) in blobs:
        fg += gain * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                              / (2 * r * r)))
    fg += 0.15 * rng.standard_normal((h, w)).astype(np.float32)
    logits = np.stack([-fg, fg])[None]  # (1, 2, H, W)
    return logits.astype(np.float32)


def _det_noise(h, w, salt):
    """Deterministic hash-noise in [-0.5, 0.5) — analytic (sin/frac), so the
    recorded-mask agreement cases reproduce bit-exactly on any numpy."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    v = np.sin(xx * 12.9898 + yy * 78.233 + salt * 37.719) * 43758.5453
    return (v - np.floor(v) - 0.5).astype(np.float32)


# Per-slice blob lists (cy, cx, r, gain) of the synthetic agreement volume:
# an organ that appears, drifts/grows, splits into two components, shrinks
# and vanishes — exercising single-CC, multi-CC and empty-pred paths.
AGREEMENT_BLOBS = [
    [(90, 90, 27, 5.0)],
    [(100, 104, 30, 5.5), (185, 70, 14, 4.0)],
    [(112, 120, 26, 5.0), (180, 178, 18, 4.5), (70, 190, 13, 4.0)],
    [(126, 134, 22, 4.8), (172, 186, 15, 4.2)],
    [(138, 146, 15, 4.2)],
    [],                                    # empty coarse pred
]


def synthetic_agreement_case(i, hw=256):
    """Deterministic (query, coarse_logits) pair for agreement slice ``i``.

    Inputs are fed in the SAM frame (256²) so both pipelines' input resizes
    no-op and the masks are bit-stable (see test_pipeline_golden's frame
    discussion).  Fully analytic: blobs + sin-hash noise, no RNG.
    """
    import numpy as np

    blobs = AGREEMENT_BLOBS[i % len(AGREEMENT_BLOBS)]
    yy, xx = np.mgrid[0:hw, 0:hw]
    fg = np.full((hw, hw), -2.0, np.float32)
    base = np.zeros((hw, hw), np.float32)
    for (cy, cx, r, gain) in blobs:
        bump = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                        / (2.0 * r * r))).astype(np.float32)
        fg += gain * bump
        base += 0.6 * bump
    fg += 0.15 * _det_noise(hw, hw, salt=3 * i + 1)
    logits = np.stack([-fg, fg])[None].astype(np.float32)
    qry = np.stack([
        base + 0.3 * _det_noise(hw, hw, salt=3 * i + 2),
        0.8 * base + 0.3 * _det_noise(hw, hw, salt=3 * i + 3),
        0.6 * base + 0.3 * _det_noise(hw, hw, salt=3 * i + 4),
    ])[None].astype(np.float32)
    return qry, logits
