"""ProtoMedSAM pipeline: coarse prototypes -> bbox prompts -> MedSAM.

Behavioral spec: reference models/ProtoMedSAM.py:10-222.  Differences from
ProtoSAM: refinement uses box prompts only; the query image is min-max
normalized to [0, 1] and fed straight to the MedSAM (SAM ViT-B) encoder
(bypassing SAM pixel normalization, reference :204-205); decoding is
sigmoid > 0.5 on the bilinear-upscaled low-res logits (:31-65); the decoder
already runs batched over components in the reference (:33-36).

Where the reference stacks multi-component masks without reduction (it is
only exercised with use_cca=True, a single component), we reduce with a
validity-masked any() so the K>1 path yields a well-formed mask.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from protosam_tpu.ops.cca import component_confidences, connected_components
from protosam_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_then_nearest,
    resize_nearest,
)
from protosam_tpu.pipeline.protosam import (
    ProtoSAM,
    ProtoSAMConfig,
    _confidence_from_logits,
    _keep_best_component,
)


class ProtoMedSAM(ProtoSAM):
    """Same construction/public API as ProtoSAM with the MedSAM forward."""

    def __init__(self, coarse_model, coarse_params, medsam_model,
                 medsam_params, config: ProtoSAMConfig | None = None):
        config = config or ProtoSAMConfig(use_points=False, use_bbox=True)
        super().__init__(coarse_model, coarse_params, medsam_model,
                         medsam_params, config)

    def _extract_prompts(self, qry, logits):
        """Bbox-only prompts + the [0,1] min-max MedSAM input image."""
        cfg = self.config

        qimg = resize_bilinear(qry, cfg.image_size)
        # f32 logit upsample + softmax + argmax at true-f32 matmul precision
        # (see protosam._extract_prompts)
        with jax.default_matmul_precision("highest"):
            logits_hi = resize_bilinear(logits.astype(jnp.float32),
                                        cfg.image_size)
        probs = jax.nn.softmax(logits_hi, axis=1)  # need_softmax -> softmax
        pred = jnp.argmax(probs, axis=1)[0].astype(jnp.float32)

        stats = connected_components(pred, cfg.max_ccs)
        conf = component_confidences(stats, probs[0, 1], pred)
        if cfg.use_cca:
            stats, conf = _keep_best_component(stats, conf)

        # bbox scaled into the 1024 frame (identity here: H=W=1024 already,
        # reference :199-202)
        boxes = stats.bboxes.astype(jnp.float32)
        valid = stats.valid
        if cfg.use_cca:
            boxes, valid = boxes[:1], valid[:1]
        k = boxes.shape[0]

        # MedSAM preprocessing: min-max to [0, 1], no pixel-stats norm
        q = qimg[0].transpose(1, 2, 0)
        q = (q - q.min()) / (q.max() - q.min())

        return {"sam_image": q, "coords": jnp.zeros((k, 0, 2)),
                "labels": jnp.zeros((k, 0), jnp.int32), "boxes": boxes,
                "valid": valid, "pred": pred, "mask_inputs": None}

    def _decode_stage(self, sam_params, emb, coords, labels, boxes, valid,
                      pred, original_size, mask_inputs=None):
        """Batched MedSAM decode: boxes only, single mask, sigmoid > 0.5
        (reference medsam_inference :31-65)."""
        cfg = self.config
        b, k = boxes.shape[:2]
        emb_rep = jnp.repeat(emb, k, axis=0)
        flat = lambda x: x.reshape((b * k,) + x.shape[2:])
        low_res, iou = self.sam_model.apply(
            {"params": sam_params}, emb_rep, flat(coords), flat(labels),
            flat(boxes), None, False, False, method=self.sam_model.decode)

        prob_mask = jax.nn.sigmoid(
            low_res[:, 0].reshape(b, k, *low_res.shape[-2:]))
        # SAM-frame bilinear + final nearest composed into one row-selected
        # matmul pair — same taps/weights (~1 ulp), skips the
        # (B, K, 1024, 1024) intermediate (see ProtoSAM._decode_stage)
        up = resize_bilinear_then_nearest(prob_mask, cfg.image_size,
                                          original_size)
        bin_masks = (up > 0.5) & valid[:, :, None, None]
        seg = jnp.any(bin_masks, axis=1).astype(jnp.float32)

        empty = jnp.max(pred, axis=(1, 2)) == 0
        pred_out = resize_nearest(pred[:, None], original_size)[:, 0]
        out = jnp.where(empty[:, None, None], pred_out, seg)
        scores = jnp.where(empty[:, None], 0.0,
                           iou[:, 0].reshape(b, k) * valid)
        return out, scores

    def segment_all(self, query_image, query_label=None):
        """Oracle whole-frame box mode (reference :224-249): one box covering
        the image, multimask output, best-vs-GT selection on the host."""
        import numpy as np

        h, w = query_image.shape[-2:]
        q = jnp.asarray(query_image)
        q = resize_bilinear(q, self.config.image_size)
        qn = (q - q.min()) / (q.max() - q.min())
        emb = self.sam_model.apply({"params": self.sam_params},
                                   qn[0].transpose(1, 2, 0)[None],
                                   method=self.sam_model.encode_image)
        boxes = jnp.asarray([[0.0, 0.0, float(w), float(h)]])
        low_res, iou = self.sam_model.apply(
            {"params": self.sam_params}, emb, jnp.zeros((1, 0, 2)),
            jnp.zeros((1, 0), jnp.int32), boxes, None, True, False,
            method=self.sam_model.decode)
        prob = jax.nn.sigmoid(low_res[0])
        masks = np.asarray(resize_bilinear(prob[:, None], (h, w))[:, 0] > 0.5)
        if query_label is None:
            return masks[0].astype(np.float32), [float(iou[0, 0])]
        gt = np.asarray(query_label).reshape(h, w)
        best, best_iou = masks[0], -1.0
        for m in masks:
            tp = np.logical_and(m, gt).sum()
            fp = np.logical_and(m, 1 - gt).sum()
            fn = np.logical_and(1 - m, gt).sum()
            i = tp / max(tp + fp + fn, 1)
            if i > best_iou:
                best, best_iou = m, i
        return best.astype(np.float32), [best_iou]
