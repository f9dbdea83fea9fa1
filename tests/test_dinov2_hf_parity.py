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
from protosam_tpu.utils.torch_convert import (
    convert_dinov2,
    hf_dinov2_to_hub_state_dict as hf_to_hub_state_dict,
)

transformers = pytest.importorskip("transformers")


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
