"""DINOv2 converter: a hub-layout state dict must convert into exactly the
param tree the flax module expects (shape-for-shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.dinov2 import build_dinov2
from protosam_tpu.utils.torch_convert import convert_dinov2


def fake_hub_state_dict(embed=64, depth=2, heads=2, patch=14, pos=37,
                        registers=0, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {
        "cls_token": r(1, 1, embed),
        "pos_embed": r(1, 1 + pos * pos, embed),
        "mask_token": r(1, embed),
        "patch_embed.proj.weight": r(embed, 3, patch, patch),
        "patch_embed.proj.bias": r(embed),
        "norm.weight": r(embed),
        "norm.bias": r(embed),
    }
    if registers:
        sd["register_tokens"] = r(1, registers, embed)
    for i in range(depth):
        p = f"blocks.{i}."
        sd |= {
            p + "norm1.weight": r(embed), p + "norm1.bias": r(embed),
            p + "attn.qkv.weight": r(3 * embed, embed),
            p + "attn.qkv.bias": r(3 * embed),
            p + "attn.proj.weight": r(embed, embed),
            p + "attn.proj.bias": r(embed),
            p + "ls1.gamma": r(embed),
            p + "norm2.weight": r(embed), p + "norm2.bias": r(embed),
            p + "mlp.fc1.weight": r(4 * embed, embed),
            p + "mlp.fc1.bias": r(4 * embed),
            p + "mlp.fc2.weight": r(embed, 4 * embed),
            p + "mlp.fc2.bias": r(embed),
            p + "ls2.gamma": r(embed),
        }
    return sd


@pytest.mark.parametrize("registers", [0, 4])
def test_converted_tree_matches_module(registers):
    model = build_dinov2("dinov2_vitt14" if not registers
                         else "dinov2_vitt14")
    # the tiny test config has no register variant; build explicitly
    from protosam_tpu.models.dinov2.vit import DinoVisionTransformer

    model = DinoVisionTransformer(embed_dim=64, depth=2, num_heads=2,
                                  num_register_tokens=registers)
    x = jnp.zeros((1, 56, 56, 3))
    want = model.init(jax.random.PRNGKey(0), x)["params"]
    got = convert_dinov2(fake_hub_state_dict(registers=registers))

    want_shapes = jax.tree.map(lambda a: a.shape, want)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), got)
    assert want_shapes == got_shapes, (want_shapes, got_shapes)

    # converted params must actually run
    out = model.apply({"params": jax.tree.map(jnp.asarray, got)}, x)
    assert out["x_norm_patchtokens"].shape == (1, 16, 64)
    assert np.isfinite(np.asarray(out["x_norm_patchtokens"])).all()


def test_alpnet_snapshot_autodetect(tmp_path):
    """checkpoint.load_torch_snapshot routes encoder.-prefixed dicts through
    the DINOv2 converter."""
    import torch

    from protosam_tpu.utils.checkpoint import load_torch_snapshot

    sd = {f"encoder.{k}": torch.from_numpy(np.asarray(v))
          for k, v in fake_hub_state_dict().items()}
    torch.save(sd, tmp_path / "snap.pth")
    params = load_torch_snapshot(str(tmp_path / "snap.pth"))
    assert "encoder" in params
    assert params["encoder"]["blocks"]["attn"]["qkv"]["kernel"].shape == \
        (2, 64, 192)
