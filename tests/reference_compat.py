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


def _install_reference_stubs():
    """Stub the reference's unavailable third-party imports and mount its
    vendored ``segment_anything`` as a top-level package.

    * ``torchvision.transforms.functional.resize/to_pil_image`` — only
      reached via ResizeLongestSide.apply_image on an already-target-size
      image, i.e. an identity; the stub asserts that and passes through.
    * ``kneed`` / ``sklearn`` — imported by util.utils at module level, used
      only by legacy helpers the forward never calls.
    """
    import importlib.machinery
    import importlib.util
    import types

    import numpy as np

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # transformers caches third-party availability at import time
    # (utils/import_utils.py module globals); import it BEFORE the sklearn
    # stub exists so it records the TRUE absence — otherwise the stub makes
    # `sklearn` look importable and transformers later dies on
    # `from sklearn.metrics import roc_curve` (test-order dependent)
    try:
        import transformers.utils.import_utils  # noqa: F401
    except ImportError:  # pragma: no cover
        pass

    def _ensure(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec(name) returns it
        # instead of raising "__spec__ is None" when other libraries probe;
        # mark it a package (submodule_search_locations/__path__) so
        # `from stub.sub import x` resolves through sys.modules
        m.__spec__ = importlib.machinery.ModuleSpec(
            name, None, is_package=True)
        m.__path__ = []
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
    # transformers' generation module does `from sklearn.metrics import
    # roc_curve` whenever sklearn LOOKS importable (the availability probe
    # is lazy); satisfy the name so the HF parity/golden fixtures can
    # import AutoModel after the stubs are installed
    _ensure("sklearn.metrics", roc_curve=None)
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


def import_reference_protosam(real_fewshot: bool = False):
    """Import the reference's full ProtoSAM pipeline module on CPU.

    models/ProtoSAM.py transitively needs packages absent here (torchvision,
    pip segment_anything, kneed, sklearn) — none of which participate in the
    point/bbox/cca forward path the golden tests exercise; see
    ``_install_reference_stubs``.

    ``real_fewshot=False`` additionally stubs ``models.grid_proto_fewshot``
    (the coarse model is replaced by a stub wrapper in those tests);
    ``real_fewshot=True`` imports the REAL grid_proto_fewshot so the joint
    coarse+refine goldens drive the reference's actual coarse wiring
    (grid_proto_fewshot.py:150-290).
    """
    import importlib

    _install_reference_stubs()

    # import the REAL models package first so the stub below doesn't shadow it
    importlib.import_module("models")
    if real_fewshot:
        # replace a previously-installed stub if the stub-coarse goldens ran
        # first in this process
        mod = sys.modules.get("models.grid_proto_fewshot")
        if mod is not None and not hasattr(mod.FewShotSeg, "forward"):
            del sys.modules["models.grid_proto_fewshot"]
        importlib.import_module("models.grid_proto_fewshot")
    elif "models.grid_proto_fewshot" not in sys.modules:
        import types

        stub = types.ModuleType("models.grid_proto_fewshot")
        stub.FewShotSeg = object
        sys.modules["models.grid_proto_fewshot"] = stub
        sys.modules["models"].grid_proto_fewshot = stub

    import matplotlib
    matplotlib.use("Agg")

    if real_fewshot and hasattr(sys.modules.get("models.ProtoSAM", None),
                                "FewShotSeg"):
        # ProtoSAM captured the stub class at its own first import; rebind
        sys.modules["models.ProtoSAM"].FewShotSeg = \
            sys.modules["models.grid_proto_fewshot"].FewShotSeg

    from models import ProtoSAM  # noqa
    return ProtoSAM


TINY_DINO_KW = dict(hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=2, patch_size=14, image_size=518)


def build_tiny_hf_dino(seed=7):
    """Tiny seeded HF Dinov2Model with HUB-faithful pos-embed interpolation.

    HF's Dinov2 is a faithful port of the hub architecture except for
    ``interpolate_pos_encoding`` (HF: size= + align_corners; hub:
    scale_factor=(g+0.1)/m bicubic, facebookresearch/dinov2
    vision_transformer.py).  The reference consumes the HUB model
    (grid_proto_fewshot.py:54-58), and our flax implementation follows hub
    semantics exactly (models/dinov2/vit.py:_interpolate_pos_encoding), so
    the golden encoder must too — we monkeypatch hub interpolation onto the
    HF embeddings instance.
    """
    import math
    import types

    import torch
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(layerscale_value=1e-5, hidden_act="gelu",
                       mlp_ratio=4, **TINY_DINO_KW)
    hf = Dinov2Model(cfg).eval()
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(seed)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    hf.load_state_dict(sd)

    def hub_interpolate(self, embeddings, height, width):
        import torch.nn.functional as F

        npatch = embeddings.shape[1] - 1
        n = self.position_embeddings.shape[1] - 1
        gh, gw = height // self.patch_size, width // self.patch_size
        if npatch == n and gh == gw:
            return self.position_embeddings
        class_pos = self.position_embeddings[:, :1]
        patch_pos = self.position_embeddings[:, 1:]
        dim = embeddings.shape[-1]
        m = int(math.sqrt(n))
        patch_pos = patch_pos.reshape(1, m, m, dim).permute(0, 3, 1, 2)
        patch_pos = F.interpolate(
            patch_pos, scale_factor=((gh + 0.1) / m, (gw + 0.1) / m),
            mode="bicubic", antialias=False)
        assert patch_pos.shape[-2:] == (gh, gw)
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, -1, dim)
        return torch.cat([class_pos, patch_pos], dim=1)

    hf.embeddings.interpolate_pos_encoding = types.MethodType(
        hub_interpolate, hf.embeddings)
    return hf


def hub_dino_adapter(hf):
    """Wrap an HF Dinov2Model in the torch.hub DINOv2 surface the reference
    consumes: ``forward_features(x) -> {"x_norm_patchtokens": ...}``
    (grid_proto_fewshot.py:90-92)."""
    import torch

    class HubDino(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hf = hf

        def forward_features(self, x):
            out = self.hf(x).last_hidden_state
            return {"x_norm_clstoken": out[:, 0],
                    "x_norm_patchtokens": out[:, 1:]}

    return HubDino().eval()


def build_reference_fewshot(image_size, encoder_adapter, proto_grid_size=8):
    """Construct the reference's REAL FewShotSeg (grid_proto_fewshot.py:25)
    on CPU with ``torch.hub.load`` patched to return ``encoder_adapter``.

    which_model='dinov2_l14' selects the dino feature path the flagship
    config runs (resize-to-14-multiple -> forward_features ->
    x_norm_patchtokens grid -> min-32 upsample, grid_proto_fewshot.py:83-103);
    the hard-coded embed_dim=1024 at :115-117 only sizes unused attention
    heads (alpmodule.py:39-55, use_attention=False)."""
    import importlib

    import torch

    _install_reference_stubs()
    importlib.import_module("models")
    mod = sys.modules.get("models.grid_proto_fewshot")
    if mod is not None and not hasattr(mod.FewShotSeg, "forward"):
        del sys.modules["models.grid_proto_fewshot"]
    gpf = importlib.import_module("models.grid_proto_fewshot")

    cfg = {"which_model": "dinov2_l14", "lora": 0, "cls_name": "grid_proto",
           "proto_grid_size": proto_grid_size, "use_coco_init": False,
           "align": False, "debug": False}
    orig = torch.hub.load
    torch.hub.load = lambda *a, **k: encoder_adapter
    try:
        model = gpf.FewShotSeg(image_size, cfg=cfg)
    finally:
        torch.hub.load = orig
    return model.eval()


def our_fewshot_params_from_hf(hf):
    """Our FewShotSeg('dinov2_t14') param tree carrying the tiny HF encoder's
    weights (the encoder is the only parameterized submodule)."""
    from protosam_tpu.utils.torch_convert import (
        convert_dinov2,
        hf_dinov2_to_hub_state_dict,
    )

    return {"encoder": convert_dinov2(
        hf_dinov2_to_hub_state_dict(hf.state_dict()))}


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
