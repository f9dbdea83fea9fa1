"""Torch-exact bicubic resize + DINOv2 pos-embed interpolation goldens.

The flagship config runs DINOv2-L at 672 px -> a 48² token grid, so the
37² pretrain pos-embed is INTERPOLATED on the production path (reference
consumes the hub model, grid_proto_fewshot.py:83-103).  The hub's
interpolate_pos_encoding calls F.interpolate bicubic with
scale_factor=(g+0.1)/37 (plain checkpoints) or antialias=True (reg
checkpoints) — these goldens pin our resampler to torch at exactly those
grids.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from protosam_tpu.ops.resize import resize_bicubic_torch


def _torch_bicubic(x, size=None, scale_factor=None, antialias=False):
    t = torch.from_numpy(np.asarray(x, np.float32))
    out = F.interpolate(t, size=size, scale_factor=scale_factor,
                        mode="bicubic", align_corners=False,
                        antialias=antialias)
    return out.numpy()


@pytest.mark.parametrize("m,g", [(37, 48), (37, 9), (16, 24)])
def test_size_mode_no_antialias(rng, m, g):
    x = rng.standard_normal((1, 4, m, m)).astype(np.float32)
    want = _torch_bicubic(x, size=(g, g))
    got = np.asarray(resize_bicubic_torch(jnp.asarray(x), (g, g)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("m,g", [(37, 48), (37, 9)])
def test_size_mode_antialias(rng, m, g):
    x = rng.standard_normal((1, 4, m, m)).astype(np.float32)
    want = _torch_bicubic(x, size=(g, g), antialias=True)
    got = np.asarray(resize_bicubic_torch(jnp.asarray(x), (g, g),
                                          antialias=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("m,g,offset", [(37, 48, 0.1), (37, 9, 0.1)])
def test_scale_factor_mode(rng, m, g, offset):
    """The interpolate_offset call mode: the GIVEN scale factor drives the
    source mapping (torch does not recompute it from the sizes)."""
    sf = (g + offset) / m
    x = rng.standard_normal((1, 4, m, m)).astype(np.float32)
    want = _torch_bicubic(x, scale_factor=(sf, sf))
    assert want.shape[-1] == g  # floor(m * sf) == g
    got = np.asarray(resize_bicubic_torch(
        jnp.asarray(x), (g, g), scales=(m / (g + offset), m / (g + offset))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_posembed_interpolation_matches_hub_semantics(rng):
    """DinoVisionTransformer._interpolate_pos_encoding at the flagship 48²
    grid == the hub model's torch computation (offset 0.1, no antialias),
    and the reg variant (offset 0, antialias)."""
    from protosam_tpu.models.dinov2.vit import DinoVisionTransformer

    m, c = 37, 8
    pos = rng.standard_normal((1, 1 + m * m, c)).astype(np.float32)

    def hub_reference(g, offset, antialias):
        patch = torch.from_numpy(pos[:, 1:]).reshape(1, m, m, c).permute(0, 3, 1, 2)
        kwargs = {}
        if offset:
            sf = (g + offset) / m
            kwargs["scale_factor"] = (sf, sf)
        else:
            kwargs["size"] = (g, g)
        out = F.interpolate(patch, mode="bicubic", antialias=antialias,
                            **kwargs)
        out = out.permute(0, 2, 3, 1).reshape(1, g * g, c).numpy()
        return np.concatenate([pos[:, :1], out], axis=1)

    for g, offset, antialias in [(48, 0.1, False), (9, 0.1, False),
                                 (48, 0.0, True)]:
        vit = DinoVisionTransformer(
            embed_dim=c, pos_embed_size=m, interpolate_offset=offset,
            interpolate_antialias=antialias)
        got = np.asarray(vit._interpolate_pos_encoding(jnp.asarray(pos), g, g))
        want = hub_reference(g, offset, antialias)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                   err_msg=f"g={g} offset={offset} aa={antialias}")
