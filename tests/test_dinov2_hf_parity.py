"""DINOv2 numerics parity vs HuggingFace transformers' Dinov2Model.

The reference consumes facebook's hub DINOv2; HF's Dinov2Model is a faithful
port of the same architecture (LayerScale, exact GELU, final layernorm,
bicubic pos-embed interpolation), so it serves as an executable golden
reference for our flax implementation with random weights.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from protosam_tpu.models.dinov2.vit import DinoVisionTransformer
from protosam_tpu.utils.torch_convert import convert_dinov2

transformers = pytest.importorskip("transformers")


def hf_to_hub_state_dict(sd):
    """Map HF Dinov2Model keys to the facebook-hub layout convert_dinov2
    expects (q/k/v fused back into qkv)."""
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    if "embeddings.mask_token" in sd:
        out["mask_token"] = sd["embeddings.mask_token"]
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        p = f"encoder.layer.{i}."
        q = sd[p + "attention.attention.query.weight"]
        k = sd[p + "attention.attention.key.weight"]
        v = sd[p + "attention.attention.value.weight"]
        out[f"blocks.{i}.attn.qkv.weight"] = torch.cat([q, k, v], dim=0)
        out[f"blocks.{i}.attn.qkv.bias"] = torch.cat([
            sd[p + "attention.attention.query.bias"],
            sd[p + "attention.attention.key.bias"],
            sd[p + "attention.attention.value.bias"]], dim=0)
        out[f"blocks.{i}.attn.proj.weight"] = \
            sd[p + "attention.output.dense.weight"]
        out[f"blocks.{i}.attn.proj.bias"] = \
            sd[p + "attention.output.dense.bias"]
        out[f"blocks.{i}.norm1.weight"] = sd[p + "norm1.weight"]
        out[f"blocks.{i}.norm1.bias"] = sd[p + "norm1.bias"]
        out[f"blocks.{i}.norm2.weight"] = sd[p + "norm2.weight"]
        out[f"blocks.{i}.norm2.bias"] = sd[p + "norm2.bias"]
        out[f"blocks.{i}.ls1.gamma"] = sd[p + "layer_scale1.lambda1"]
        out[f"blocks.{i}.ls2.gamma"] = sd[p + "layer_scale2.lambda1"]
        out[f"blocks.{i}.mlp.fc1.weight"] = sd[p + "mlp.fc1.weight"]
        out[f"blocks.{i}.mlp.fc1.bias"] = sd[p + "mlp.fc1.bias"]
        out[f"blocks.{i}.mlp.fc2.weight"] = sd[p + "mlp.fc2.weight"]
        out[f"blocks.{i}.mlp.fc2.bias"] = sd[p + "mlp.fc2.bias"]
        i += 1
    return out


@pytest.fixture(scope="module")
def pair():
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    cfg = Dinov2Config(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, patch_size=14, image_size=518,
                       mlp_ratio=4, layerscale_value=1e-5,
                       hidden_act="gelu")
    hf = Dinov2Model(cfg).eval()
    # non-trivial weights everywhere
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(7)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    hf.load_state_dict(sd)

    ours = DinoVisionTransformer(embed_dim=64, depth=2, num_heads=2,
                                 pos_embed_size=37)
    params = convert_dinov2(hf_to_hub_state_dict(hf.state_dict()))
    return hf, ours, params


def test_native_grid_parity(pair):
    """518² input: no pos-embed interpolation -> tight tolerance."""
    hf, ours, params = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 518, 518, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    got_all = np.concatenate(
        [np.asarray(got["x_norm_clstoken"])[:, None],
         np.asarray(got["x_norm_patchtokens"])], axis=1)
    np.testing.assert_allclose(got_all, want, atol=3e-5, rtol=1e-3)


def test_interpolated_grid_close(pair):
    """56² input exercises pos-embed interpolation (HF uses torch bicubic
    antialias; jax.image cubic differs sub-1e-2 at these magnitudes)."""
    hf, ours, params = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    got_all = np.concatenate(
        [np.asarray(got["x_norm_clstoken"])[:, None],
         np.asarray(got["x_norm_patchtokens"])], axis=1)
    assert np.abs(got_all - want).max() < 0.05
    # correlation should be essentially 1
    c = np.corrcoef(got_all.reshape(-1), want.reshape(-1))[0, 1]
    assert c > 0.999
