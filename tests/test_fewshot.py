"""FewShotSeg: composition parity vs reference cls_unit orchestration and
smoke tests of the full coarse model with the tiny DINOv2 encoder."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg

from tests.reference_compat import import_reference_alpmodule

alpmodule = import_reference_alpmodule()


def reference_forward_logic(qry_fts, supp_fts, fg_mask, bg_mask, val_wsize,
                            kernel_size):
    """Reassemble the reference FewShotSeg scoring loop
    (grid_proto_fewshot.py:237-268) from MultiProtoAsConv calls."""
    m = alpmodule.MultiProtoAsConv([8, 8], list(qry_fts.shape[-2:]))
    qry = torch.from_numpy(qry_fts).unsqueeze(1)
    sup_all = torch.from_numpy(supp_fts).unsqueeze(0).unsqueeze(2)
    bg = torch.from_numpy(bg_mask[:, None]).unsqueeze(0)
    with torch.no_grad():
        bg_score, _, _, _ = m(qry, sup_all, bg, mode="gridconv", thresh=0.95,
                              isval=True, val_wsize=val_wsize)
        fg_scores = []
        for i in range(supp_fts.shape[0]):
            msk = torch.from_numpy(fg_mask[i:i + 1, None])  # (1,1,h,w)
            mode = ("gridconv+" if torch.nn.functional.avg_pool2d(
                msk, kernel_size).max() >= 0.95 else "mask")
            sup_i = torch.from_numpy(supp_fts[i:i + 1]).unsqueeze(0).unsqueeze(2)
            sc, _, _, _ = m(qry, sup_i, msk.unsqueeze(0), mode=mode,
                            thresh=0.95, isval=True, val_wsize=val_wsize)
            fg_scores.append(sc)
        fg = torch.stack(fg_scores, dim=1).max(dim=1)[0]
    return torch.cat([bg_score, fg], dim=1).numpy()


def test_score_composition_matches_reference(rng):
    s, c, h = 3, 16, 24
    qry = rng.standard_normal((1, c, h, h)).astype(np.float32)
    sup = rng.standard_normal((s, c, h, h)).astype(np.float32)
    fg = np.zeros((s, h, h), np.float32)
    fg[0, 4:15, 6:18] = 1            # big: stays gridconv+
    fg[1, 10:12, 10:12] = 1          # tiny: falls back to mask mode
    fg[2, 2:20, 2:20] = 1
    bg = 1.0 - fg

    model = FewShotSeg(image_size=672, which_model="dinov2_l14",
                       proto_grid_size=8)
    # kernel_size for 672/dino = 48//8 = 6
    want = reference_forward_logic(qry, sup, fg, bg, val_wsize=2,
                                   kernel_size=model.kernel_size)
    got = model.apply({"params": {}}, jnp.asarray(qry), jnp.asarray(sup),
                      jnp.asarray(fg), jnp.asarray(bg), 2,
                      method=model.score)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_fewshot_tiny_end_to_end(rng):
    model = FewShotSeg(image_size=126, which_model="dinov2_t14")
    supp = jnp.asarray(rng.standard_normal((1, 3, 126, 126)), jnp.float32)
    qry = jnp.asarray(rng.standard_normal((1, 3, 126, 126)), jnp.float32)
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    params = model.init(jax.random.PRNGKey(0), supp, fg, 1 - fg, qry)["params"]
    out = model.apply({"params": params}, supp, fg, 1 - fg, qry)
    assert out["logits"].shape == (1, 2, 126, 126)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # feature contract: 126//14=9 < 32 -> upsampled to 32²
    assert out["qry_fts"].shape[-2:] == (32, 32)


def test_fewshot_resnet_smoke(rng):
    model = FewShotSeg(image_size=64, which_model="dlfcn_res101",
                       proto_grid_size=8)
    supp = jnp.asarray(rng.standard_normal((1, 3, 64, 64)), jnp.float32)
    qry = jnp.asarray(rng.standard_normal((1, 3, 64, 64)), jnp.float32)
    fg = jnp.zeros((1, 64, 64)).at[:, 16:48, 16:48].set(1.0)
    params = model.init(jax.random.PRNGKey(0), supp, fg, 1 - fg, qry)["params"]
    out = model.apply({"params": params}, supp, fg, 1 - fg, qry)
    assert out["logits"].shape == (1, 2, 64, 64)
    assert out["qry_fts"].shape[1] == 256  # localconv output channels
    assert np.isfinite(np.asarray(out["logits"])).all()
