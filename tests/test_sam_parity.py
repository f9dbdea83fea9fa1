"""Golden parity: flax SAM modules vs the reference torch modeling package.

The reference torch modules (models/segment_anything/modeling/*) are driven
on CPU with random weights; weights are converted with
utils/torch_convert.convert_sam and outputs compared.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_compat import import_sam_modeling  # noqa: E402

_m = import_sam_modeling()
TorchEncoder = _m.image_encoder.ImageEncoderViT
TorchDecoder = _m.mask_decoder.MaskDecoder
TorchPromptEncoder = _m.prompt_encoder.PromptEncoder
TorchTwoWay = _m.transformer.TwoWayTransformer

from protosam_tpu.models.sam.image_encoder import ImageEncoderViT
from protosam_tpu.models.sam.mask_decoder import MaskDecoder
from protosam_tpu.models.sam.prompt_encoder import PromptEncoder
from protosam_tpu.utils.torch_convert import convert_sam

from functools import partial


def seeded_torch(seed=0):
    torch.manual_seed(seed)


def randomize(module):
    """Give every param non-trivial values (default zeros hide layout bugs)."""
    sd = module.state_dict()
    g = torch.Generator().manual_seed(42)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope="module")
def tiny_encoder_pair():
    seeded_torch()
    t = TorchEncoder(img_size=64, patch_size=16, embed_dim=64, depth=3,
                     num_heads=4, mlp_ratio=4.0, out_chans=32, qkv_bias=True,
                     norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                     use_rel_pos=True, window_size=2,
                     global_attn_indexes=(1,)).eval()
    randomize(t)
    f = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=64, depth=3,
                        num_heads=4, mlp_ratio=4.0, out_chans=32,
                        use_rel_pos=True, window_size=2,
                        global_attn_indexes=(1,))
    params = convert_sam({f"image_encoder.{k}": v
                          for k, v in t.state_dict().items()})
    return t, f, params["image_encoder"]


def test_image_encoder_parity(tiny_encoder_pair):
    t, f, params = tiny_encoder_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()  # NCHW out
    got = np.asarray(f.apply({"params": params}, jnp.asarray(x)))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def padded_encoder_pair():
    """80px/patch16 -> 5x5 tokens with window_size=2: ph=pw=1 exercises the
    window-pad path (production vit at 1024px/win14 pads 64->70)."""
    seeded_torch()
    kw = dict(img_size=80, patch_size=16, embed_dim=64, depth=3, num_heads=4,
              mlp_ratio=4.0, out_chans=32, use_rel_pos=True, window_size=2,
              global_attn_indexes=(1,))
    t = TorchEncoder(qkv_bias=True,
                     norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                     **kw).eval()
    randomize(t)
    f = ImageEncoderViT(**kw)
    params = convert_sam({f"image_encoder.{k}": v
                          for k, v in t.state_dict().items()})
    return t, f, params["image_encoder"]


def test_image_encoder_padded_windows(padded_encoder_pair):
    """Torch parity at a geometry where windows pad (the production vit
    at 1024px/win14 pads 64->70 tokens): pad tokens must carry the qkv
    Dense bias — the reference zero-pads x BEFORE qkv
    (reference image_encoder.py:280-302), ours pads the projection."""
    t, f, params = padded_encoder_pair
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 80, 80, 3)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(f.apply({"params": params}, jnp.asarray(x)))
    got = out.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.fixture(scope="module")
def prompt_encoder_pair():
    seeded_torch(1)
    t = TorchPromptEncoder(embed_dim=256, image_embedding_size=(64, 64),
                           input_image_size=(1024, 1024),
                           mask_in_chans=16).eval()
    randomize(t)
    f = PromptEncoder()
    params = convert_sam({f"prompt_encoder.{k}": v
                          for k, v in t.state_dict().items()})
    return t, f, params["prompt_encoder"]


def test_prompt_encoder_points_boxes(prompt_encoder_pair):
    t, f, params = prompt_encoder_pair
    coords = np.array([[[100.0, 200.0], [512.0, 10.0]]], np.float32)
    labels = np.array([[1, 0]], np.int32)
    boxes = np.array([[10.0, 20.0, 300.0, 400.0]], np.float32)
    with torch.no_grad():
        sp_t, dn_t = t(points=(torch.from_numpy(coords), torch.from_numpy(labels)),
                       boxes=torch.from_numpy(boxes), masks=None)
    sp, dn = f.apply({"params": params}, jnp.asarray(coords),
                     jnp.asarray(labels), jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(sp), sp_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dn).transpose(0, 3, 1, 2),
                               dn_t.detach().numpy(), atol=1e-5)


def test_prompt_encoder_points_only_pads(prompt_encoder_pair):
    t, f, params = prompt_encoder_pair
    coords = np.array([[[100.0, 200.0]]], np.float32)
    labels = np.array([[1]], np.int32)
    with torch.no_grad():
        sp_t, dn_t = t(points=(torch.from_numpy(coords), torch.from_numpy(labels)),
                       boxes=None, masks=None)
    sp, dn = f.apply({"params": params}, jnp.asarray(coords),
                     jnp.asarray(labels), None)
    np.testing.assert_allclose(np.asarray(sp), sp_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dn).transpose(0, 3, 1, 2),
                               dn_t.detach().numpy(), atol=1e-5)


def test_prompt_encoder_padded_equals_reference_explicit(prompt_encoder_pair):
    """Our static padded layout (-1 rows) must equal the reference run on the
    unpadded prompt set: padding rows only add not_a_point embeddings, which
    the reference also appends."""
    t, f, params = prompt_encoder_pair
    coords3 = np.array([[[100.0, 200.0], [0.0, 0.0], [0.0, 0.0]]], np.float32)
    labels3 = np.array([[1, -1, -1]], np.int32)
    with torch.no_grad():
        sp_t, _ = t(points=(torch.from_numpy(coords3), torch.from_numpy(labels3)),
                    boxes=torch.zeros(1, 4), masks=None)
    sp, _ = f.apply({"params": params}, jnp.asarray(coords3),
                    jnp.asarray(labels3), jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(sp), sp_t.detach().numpy(), atol=1e-5)


def test_dense_pe_matches(prompt_encoder_pair):
    t, f, params = prompt_encoder_pair
    with torch.no_grad():
        want = t.get_dense_pe().numpy()
    got = np.asarray(f.apply({"params": params}, method=f.get_dense_pe))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


@pytest.fixture(scope="module")
def decoder_pair():
    seeded_torch(2)
    t = TorchDecoder(
        transformer_dim=256,
        transformer=TorchTwoWay(depth=2, embedding_dim=256, mlp_dim=2048,
                                num_heads=8),
        num_multimask_outputs=3).eval()
    randomize(t)
    f = MaskDecoder()
    params = convert_sam({f"mask_decoder.{k}": v
                          for k, v in t.state_dict().items()})
    return t, f, params["mask_decoder"]


@pytest.mark.parametrize("multimask", [True, False])
def test_mask_decoder_parity(decoder_pair, multimask):
    t, f, params = decoder_pair
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((1, 256, 16, 16)).astype(np.float32)
    pe = rng.standard_normal((1, 256, 16, 16)).astype(np.float32)
    sparse = rng.standard_normal((2, 5, 256)).astype(np.float32)
    dense = rng.standard_normal((2, 256, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_m, want_iou = t(
            image_embeddings=torch.from_numpy(emb),
            image_pe=torch.from_numpy(pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=multimask)
    emb_b = np.broadcast_to(emb, (2, 256, 16, 16))
    got_m, got_iou = f.apply(
        {"params": params}, jnp.asarray(emb_b.transpose(0, 2, 3, 1)),
        jnp.asarray(pe.transpose(0, 2, 3, 1)), jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)), multimask)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_batched_decode_equals_per_prompt_loop(decoder_pair):
    """The pipeline batches the decoder over components; must equal the
    reference's per-component loop (ProtoSAM.py:505-527) exactly."""
    t, f, params = decoder_pair
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((4, 16, 16, 256)).astype(np.float32)
    pe = rng.standard_normal((1, 16, 16, 256)).astype(np.float32)
    sparse = rng.standard_normal((4, 3, 256)).astype(np.float32)
    dense = rng.standard_normal((4, 16, 16, 256)).astype(np.float32)

    batched_m, batched_iou = f.apply(
        {"params": params}, jnp.asarray(emb), jnp.asarray(pe),
        jnp.asarray(sparse), jnp.asarray(dense), False)
    for i in range(4):
        mi, ioui = f.apply(
            {"params": params}, jnp.asarray(emb[i:i + 1]), jnp.asarray(pe),
            jnp.asarray(sparse[i:i + 1]), jnp.asarray(dense[i:i + 1]), False)
        np.testing.assert_allclose(np.asarray(batched_m[i]),
                                   np.asarray(mi[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched_iou[i]),
                                   np.asarray(ioui[0]), atol=1e-5)
