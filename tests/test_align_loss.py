"""Align-loss parity: FewShotSeg.align_loss vs the reference alignLoss
recomposed from MultiProtoAsConv calls + torch cross-entropy
(grid_proto_fewshot.py:293-375)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg

from tests.reference_compat import import_reference_alpmodule

alpmodule = import_reference_alpmodule()


def reference_align_loss(qry_fts, pred, supp_fts, fore_mask, back_mask,
                         kernel_size):
    """Reference alignLoss with n_ways=1 (grid_proto_fewshot.py:293-375)."""
    m = alpmodule.MultiProtoAsConv([8, 8], list(qry_fts.shape[-2:]))
    pred_t = torch.from_numpy(pred)
    pred_mask = pred_t.argmax(dim=1, keepdim=False).unsqueeze(0)  # 1,N,h,w
    binary = [(pred_mask == i).float() for i in range(2)]
    qry = torch.from_numpy(qry_fts).unsqueeze(0).unsqueeze(2)  # way,nb,... -> [1,1,1,C,h,w]

    losses = []
    n_shots = supp_fts.shape[0]
    with torch.no_grad():
        for shot in range(n_shots):
            img_fts = torch.from_numpy(
                supp_fts[shot:shot + 1][None])          # 1,1,C,h,w -> qry arg
            size = img_fts.shape[-2:]
            q_fg = F.interpolate(binary[1], size=size, mode="bilinear")
            q_bg = F.interpolate(binary[0], size=size, mode="bilinear")

            bg_score, _, _, _ = m(qry=img_fts, sup_x=qry, sup_y=q_bg.unsqueeze(-3),
                                  mode="gridconv", thresh=0.95)
            fg_mode = ("gridconv+" if F.avg_pool2d(q_fg, 4).max() >= 0.95
                       else "mask")
            fg_score, _, _, _ = m(qry=img_fts, sup_x=qry, sup_y=q_fg.unsqueeze(2),
                                  mode=fg_mode, thresh=0.95)
            sp = torch.cat([bg_score, fg_score], dim=1)
            sp = F.interpolate(sp, size=fore_mask.shape[-2:], mode="bilinear")
            label = torch.full(fore_mask.shape[-2:], 255).long()
            label[torch.from_numpy(fore_mask[shot]) == 1] = 1
            label[torch.from_numpy(back_mask[shot]) == 1] = 0
            losses.append(F.cross_entropy(sp.float(), label[None],
                                          ignore_index=255) / n_shots)
    return float(torch.sum(torch.stack(losses)))


def test_align_loss_matches_reference(rng):
    s, c, h, img = 2, 16, 16, 32
    qry_fts = rng.standard_normal((1, c, h, h)).astype(np.float32)
    supp_fts = rng.standard_normal((s, c, h, h)).astype(np.float32)
    pred = rng.standard_normal((1, 2, h, h)).astype(np.float32)
    pred[:, 1, 4:12, 4:12] += 3.0   # make fg win somewhere
    fore = np.zeros((s, img, img), np.float32)
    fore[:, 8:24, 8:24] = 1
    back = 1.0 - fore
    back[:, 0, 0] = 0               # leave an ignore pixel

    want = reference_align_loss(qry_fts, pred, supp_fts, fore, back,
                                kernel_size=4)

    model = FewShotSeg(image_size=img, which_model="dinov2_t14",
                       proto_grid_size=8)
    got = float(model.apply(
        {"params": {}}, jnp.asarray(qry_fts), jnp.asarray(pred),
        jnp.asarray(supp_fts), jnp.asarray(fore), jnp.asarray(back),
        2, method=model.align_loss))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
