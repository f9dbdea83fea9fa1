"""ALPNet few-shot coarse segmenter in flax.

Behavioral spec: reference models/grid_proto_fewshot.py (FewShotSeg:25-290).
One encoder pass over [support..., query] concatenated, masks downsampled to
the feature grid (nearest), a BG 'gridconv' scoring pass over all shots
jointly, per-shot FG 'gridconv+' passes (max over shots) with the
data-dependent fallback to 'mask' mode, and bilinear upsampling of the
2-class score map back to image size.

The wrapper/array API is TPU-native (stacked arrays, no way/shot nested
lists — 1-way episodes, matching the reference's own assert at
grid_proto_fewshot.py:172).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from protosam_tpu.models.backbones.resnet import DeeplabRes101Encoder
from protosam_tpu.models.dinov2.vit import build_dinov2
from protosam_tpu.ops.alp import alp_score, fg_score_with_fallback
from protosam_tpu.ops.resize import resize_bilinear, resize_nearest

import math

DEFAULT_FEATURE_SIZE = 32  # reference util/consts.py:2
FG_THRESH = 0.95           # reference grid_proto_fewshot.py:21-22
BG_THRESH = 0.95

_ENCODER_ALIASES = {
    # reference config names (grid_proto_fewshot.py:49-72) -> builder keys
    "dlfcn_res101": "dlfcn_res101",
    "default": "dlfcn_res101",
    "dinov2_l14": "dinov2_vitl14",
    "dinov2_l14_reg": "dinov2_vitl14_reg",
    "dinov2_b14": "dinov2_vitb14",
    "dinov2_s14": "dinov2_vits14",
    "dinov2_t14": "dinov2_vitt14",
}


class FewShotSeg(nn.Module):
    image_size: int = 672
    which_model: str = "dinov2_l14"
    proto_grid_size: int = 8
    dtype: jnp.dtype = jnp.float32
    # route ALP matching through the fused Pallas kernel (inference only —
    # the kernel has no VJP; training keeps the jnp path)
    use_fused_alp: bool = False
    # int8 MXU path for the DINOv2 dense stages (ops/quant; the f32
    # coarse-logit tail is never quantized)
    quant_dense: bool = False
    # plain-XLA attention even on TPU (the f32-strict harness leg)
    force_xla_attn: bool = False

    @property
    def feature_hw(self) -> int:
        if self.which_model in ("dlfcn_res101", "default"):
            return math.ceil(self.image_size / 8)
        return max(self.image_size // 14, DEFAULT_FEATURE_SIZE)

    @property
    def kernel_size(self) -> int:
        """Training-time pooling window = feature_hw // proto_grid
        (reference alpmodule.py:34-37); also the window of the FG mode
        fallback check (grid_proto_fewshot.py:254-256)."""
        return self.feature_hw // self.proto_grid_size

    def setup(self):
        key = _ENCODER_ALIASES.get(self.which_model, self.which_model)
        if key == "dlfcn_res101":
            self.encoder = DeeplabRes101Encoder(dtype=self.dtype)
        else:
            self.encoder = build_dinov2(key, dtype=self.dtype,
                                        quant_dense=self.quant_dense,
                                        force_xla_attn=self.force_xla_attn)

    def get_features(self, imgs: jax.Array) -> jax.Array:
        """imgs: (B, 3, H, W) -> features (B, C, h, w).

        DINOv2 path per reference grid_proto_fewshot.py:83-103: resize to the
        nearest multiple of 14, take x_norm_patchtokens as a (h, w) grid,
        upsample to >= 32² if smaller.
        """
        x = imgs.transpose(0, 2, 3, 1)  # NHWC internal
        if self.which_model in ("dlfcn_res101", "default"):
            fts = self.encoder(x)
        else:
            side = self.image_size // 14 * 14
            x = resize_bilinear(x.transpose(0, 3, 1, 2), (side, side))
            x = x.transpose(0, 2, 3, 1)
            tokens = self.encoder(x)["x_norm_patchtokens"]  # (B, N, C)
            g = side // 14
            fts = tokens.reshape(tokens.shape[0], g, g, tokens.shape[-1])
            if g < DEFAULT_FEATURE_SIZE:
                fts = resize_bilinear(
                    fts.transpose(0, 3, 1, 2),
                    (DEFAULT_FEATURE_SIZE, DEFAULT_FEATURE_SIZE)
                ).transpose(0, 2, 3, 1)
        return fts.transpose(0, 3, 1, 2)  # (B, C, h, w)

    def score(self, qry_fts: jax.Array, supp_fts: jax.Array,
              fore_mask: jax.Array, back_mask: jax.Array,
              val_wsize: int) -> jax.Array:
        """ALP scoring given features: the shared core of forward and the
        training-time align loss.

        qry_fts (1, C, h, w); supp_fts (S, C, h, w); masks (S, h, w) at
        feature resolution.  Returns (1, 2, h, w) raw scores.

        Runs in f32 at true-f32 matmul precision regardless of the build
        dtype (the f32 coarse-logit tail, r5): the cosine match here is
        <1% of pipeline FLOPs, but its argmax seeds CCA and every SAM
        prompt — bf16 normalization/dot rounding moved mask boundaries
        (PARITY.md "Measured bf16 drift").  Without the precision scope,
        TPU executes "f32" dots as single-pass bf16.  Reference numerics
        being matched: alpmodule.py:57-94, grid_proto_fewshot.py:270-273.
        """
        qry_fts = qry_fts.astype(jnp.float32)
        supp_fts = supp_fts.astype(jnp.float32)
        fg = fore_mask[:, None].astype(jnp.float32)
        bg = back_mask[:, None].astype(jnp.float32)

        with jax.default_matmul_precision("highest"):
            bg_score = alp_score(qry_fts, supp_fts, bg, "gridconv",
                                 val_wsize, BG_THRESH,
                                 use_fused=self.use_fused_alp)

            def fg_one(supp_ft, msk):
                return fg_score_with_fallback(
                    qry_fts, supp_ft[None], msk[None, None],
                    window=val_wsize, fallback_window=self.kernel_size,
                    thresh=FG_THRESH, use_fused=self.use_fused_alp)

            fg_scores = jax.vmap(fg_one)(supp_fts,
                                         fore_mask.astype(jnp.float32))
            fg_score = jnp.max(fg_scores, axis=0)  # max over shots (:262-264)

        return jnp.concatenate([bg_score, fg_score], axis=1)

    def __call__(self, supp_imgs: jax.Array, fore_mask: jax.Array,
                 back_mask: jax.Array, qry_imgs: jax.Array,
                 isval: bool = True, val_wsize: int = 2,
                 supp_fts: jax.Array | None = None) -> dict[str, Any]:
        """supp_imgs (S, 3, H, W); fore/back_mask (S, H, W);
        qry_imgs (1, 3, H, W).

        Returns dict: logits (1, 2, H, W), supp_fts, qry_fts.
        """
        s = supp_imgs.shape[0]
        img_hw = supp_imgs.shape[-2:]
        window = val_wsize if isval else self.kernel_size

        if supp_fts is None:
            fts = self.get_features(
                jnp.concatenate([supp_imgs, qry_imgs], axis=0))
            supp_fts, qry_fts = fts[:s], fts[s:]
        else:
            qry_fts = self.get_features(qry_imgs)

        hw = supp_fts.shape[-2:]
        res_fg = resize_nearest(fore_mask.astype(jnp.float32), hw)
        res_bg = resize_nearest(back_mask.astype(jnp.float32), hw)

        pred = self.score(qry_fts, supp_fts, res_fg, res_bg, window)
        # logit upsample stays in the f32 tail: the resize is a pair of
        # weight-matrix einsums whose default TPU precision is single-pass
        # bf16 — enough to move the downstream argmax at mask boundaries
        with jax.default_matmul_precision("highest"):
            logits = resize_bilinear(pred, img_hw)
        return {"logits": logits, "supp_fts": supp_fts, "qry_fts": qry_fts}

    def align_loss(self, qry_fts: jax.Array, pred: jax.Array,
                   supp_fts: jax.Array, fore_mask: jax.Array,
                   back_mask: jax.Array, val_wsize: int) -> jax.Array:
        """PANet prototype-alignment loss (reference
        grid_proto_fewshot.py:293-375): swap roles — the query's predicted
        fg/bg masks pool prototypes from the query features, which then
        score each support image against its ground truth.

        pred: (1, 2, h', w') raw scores at feature resolution (pre-upsample).
        fore/back_mask: (S, H, W) binary support labels at image size.
        """
        s = supp_fts.shape[0]
        hw = qry_fts.shape[-2:]
        pred_cls = jnp.argmax(pred, axis=1)  # (1, h', w')
        qry_bg = (pred_cls == 0).astype(jnp.float32)
        qry_fg = (pred_cls == 1).astype(jnp.float32)
        # masks are bilinearly resized to the feature grid (reference :337-342)
        qry_bg = resize_bilinear(qry_bg[None], hw)[0]
        qry_fg = resize_bilinear(qry_fg[None], hw)[0]

        def one_shot(supp_ft, fg_m, bg_m):
            bg_score = alp_score(supp_ft[None], qry_fts, qry_bg[:, None],
                                 "gridconv", val_wsize, BG_THRESH)
            fg_score = fg_score_with_fallback(
                supp_ft[None], qry_fts, qry_fg[:, None],
                window=val_wsize, fallback_window=4, thresh=FG_THRESH)
            sp = jnp.concatenate([bg_score, fg_score], axis=1)
            sp = resize_bilinear(sp, fore_mask.shape[-2:])
            # support label: 1 fg, 0 bg, 255 ignore (reference :366-373)
            label = jnp.where(fg_m == 1, 1, jnp.where(bg_m == 1, 0, 255))
            logp = jax.nn.log_softmax(sp[0].astype(jnp.float32), axis=0)
            picked = jnp.where(label == 255, 0.0,
                               jnp.take_along_axis(
                                   logp, jnp.clip(label, 0, 1)[None], axis=0)[0])
            denom = jnp.maximum(jnp.sum(label != 255), 1)
            return -jnp.sum(picked) / denom / s

        losses = jax.vmap(one_shot)(supp_fts, fore_mask, back_mask)
        return jnp.sum(losses)
