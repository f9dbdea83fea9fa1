"""ProtoSAM pipeline: coarse prototypes -> device-side prompts -> SAM.

Behavioral spec: reference models/ProtoSAM.py:184-678.  The reference's
forward round-trips to the host mid-pipeline (coarse logits -> numpy -> cv2
connected components -> CPU prompt math -> uint8 numpy -> SAM); here the
entire slice program is ONE jitted XLA computation:

  coarse ALPNet logits (672²)
  -> bilinear to the 1024² SAM frame, softmax, argmax
  -> device CCA (+ optional keep-best-component 'cca' mode)
  -> per-component top-conf/centroid points + bboxes (padded to max_ccs)
  -> the uint8 min-max renormalization quirk (ProtoSAM.py:660, reproduced
     exactly: floor to uint8 steps) + SAM pixel normalization
  -> SAM encoder (one 1024² pass) -> decoder batched over components
  -> component masks summed, nearest-resized back to the query frame.

Flag semantics (use_points/use_bbox/use_cca/point_mode/...) follow
reference ProtoSAM.__init__:184-203 with the same defaults as
validation_protosam.py:220-232.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

from protosam_tpu.models.io_protocol import (
    ALPNetInput,
    BOTH_MODE,
    POINT_MODES,
)
from protosam_tpu.models.sam.sam import (
    DEFAULT_PIXEL_MEAN,
    DEFAULT_PIXEL_STD,
    preprocess as sam_preprocess,
)
from protosam_tpu.ops.cca import (
    ComponentStats,
    component_confidences,
    connected_components,
)
from protosam_tpu.ops.prompts import build_sam_prompts
from protosam_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_then_nearest,
    resize_nearest,
)


@dataclasses.dataclass(frozen=True)
class ProtoSAMConfig:
    """Static pipeline flags (reference ProtoSAM.__init__:184-203)."""

    image_size: tuple[int, int] = (1024, 1024)
    num_points_for_sam: int = 1
    use_points: bool = True
    use_bbox: bool = True
    use_mask: bool = False
    # reproduce the reference's uint8 cast of the mask prompt (its -8 bg
    # fill wraps to 248, predict_w_masks ProtoSAM.py:479) — OFF by default
    # (the fixed 10/-8 prompt is what the code plainly intends; PARITY.md),
    # ON in the recorded-golden harness so the use_mask flag is verifiable
    # against the reference's actual output
    mask_prompt_uint8_wrap: bool = False
    use_neg_points: bool = False
    use_cca: bool = True
    point_mode: str = BOTH_MODE
    coarse_pred_only: bool = False
    max_ccs: int = 8

    def __post_init__(self):
        if self.point_mode not in POINT_MODES:
            raise ValueError(f"point mode must be one of {POINT_MODES}")
        if not (self.use_bbox or self.use_points or self.use_mask):
            raise ValueError("must use at least one of bbox, points, or mask")



def _xla_opts(sam_model):
    """Per-compile XLA options for the big-model pipeline programs.

    r3 HLO forensics: XLA's default 16 MB per-fusion scoped-VMEM budget
    caps the vit_h fc2 conv emitter at a 64-wide K window (half an MXU
    K-tile); 48 MB lets it pick full tiles — measured -4% on the vit_h
    encoder (491.7 vs 511.7 ms/batch-8), neutral at vit_b (108.0 vs
    106.9), so it is applied only when the SAM encoder is wider than
    1024.  ``PTPU_SCOPED_VMEM_KIB`` overrides (any model; "0" disables);
    only forwarded on TPU backends (the CPU compiler rejects the flag).
    """
    kib = os.environ.get("PTPU_SCOPED_VMEM_KIB")
    if kib == "0":
        return None
    if kib is None:
        embed = getattr(sam_model, "encoder_embed_dim", 0) or 0
        if embed < 1280:
            return None
        kib = "49152"
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}

def _keep_best_component(stats: ComponentStats, conf: jax.Array
                         ) -> tuple[ComponentStats, jax.Array]:
    """'cca' mode (reference util/utils.py:496-541): reduce the component set
    to the single most-confident one (slot 0), or none if best conf is 0."""
    best = jnp.argmax(conf)
    any_conf = jnp.max(conf) > 0
    k = stats.valid.shape[0]
    sel = jnp.arange(k) == 0

    best_mask = (stats.labels == best + 1) & any_conf
    labels = best_mask.astype(jnp.int32)
    valid = sel & any_conf
    take = lambda a: jnp.where(
        sel.reshape((k,) + (1,) * (a.ndim - 1)), a[best][None], a * 0)
    new = ComponentStats(
        labels=labels,
        num=jnp.where(any_conf, 1, 0).astype(jnp.int32),
        valid=valid,
        areas=take(stats.areas),
        bboxes=take(stats.bboxes),
        centroids=take(stats.centroids),
    )
    new_conf = jnp.where(sel, conf[best], 0.0) * any_conf
    return new, new_conf


class ProtoSAM:
    """Public pipeline object; API parity with reference ProtoSAM:
    ``forward(query_image, coarse_model_input, degrees_rotate=0)``
    -> ``(pred, scores)``.

    Construction takes the flax modules + their params instead of torch
    nn.Modules; the jitted core is built once per (static shape, flags).
    """

    def __init__(self, coarse_model, coarse_params, sam_model, sam_params,
                 config: ProtoSAMConfig = ProtoSAMConfig()):
        self.coarse_model = coarse_model
        self.coarse_params = coarse_params
        self.sam_model = sam_model
        self.sam_params = sam_params
        self.config = config
        self._jit_forward = jax.jit(
            self._forward_core, static_argnames=("isval", "val_wsize"))

    # ---- jitted core ------------------------------------------------------

    def _coarse_logits(self, coarse_params, inp_arrays, isval, val_wsize):
        supp, fg, bg, qry, supp_fts = inp_arrays
        out = self.coarse_model.apply(
            {"params": coarse_params}, supp, fg, bg, qry, isval, val_wsize,
            supp_fts=supp_fts)
        return out["logits"]

    def _forward_core(self, coarse_params, sam_params, supp, fg, bg, qry,
                      supp_fts, isval=True, val_wsize=2):
        logits = self._coarse_logits(coarse_params,
                                     (supp, fg, bg, qry, supp_fts),
                                     isval, val_wsize)
        return self._refine_core(sam_params, qry, logits)

    @functools.cached_property
    def _jit_coarse(self):
        def coarse(coarse_params, supp, fg, bg, qry, supp_fts, isval=True,
                   val_wsize=2):
            return self._coarse_logits(coarse_params,
                                       (supp, fg, bg, qry, supp_fts),
                                       isval, val_wsize)
        return jax.jit(coarse, static_argnames=("isval", "val_wsize"))

    @functools.cached_property
    def _jit_refine(self):
        return jax.jit(self._refine_core,
                       compiler_options=_xla_opts(self.sam_model))

    def _refine_core(self, sam_params, qry, logits):
        cfg = self.config
        original_size = qry.shape[-2:]

        if cfg.coarse_pred_only:
            pred = jnp.argmax(logits, axis=1)[0]
            probs = jax.nn.softmax(logits, axis=1)
            conf = _confidence_from_logits(logits)
            if cfg.use_cca:
                stats = connected_components(pred.astype(jnp.float32),
                                             cfg.max_ccs)
                c = component_confidences(stats, probs[0, 1],
                                          pred.astype(jnp.float32))
                stats, c = _keep_best_component(stats, c)
                pred = (stats.labels > 0).astype(jnp.float32) * pred
                conf = jnp.max(c)
            return pred, conf[None], logits

        ex = self._extract_prompts(qry, logits)
        emb = self.sam_model.apply({"params": sam_params}, ex["sam_image"][None],
                                   method=self.sam_model.encode_image)
        mi = ex.get("mask_inputs")
        out, scores = self._decode_stage(
            sam_params, emb, ex["coords"][None], ex["labels"][None],
            None if ex["boxes"] is None else ex["boxes"][None],
            ex["valid"][None], ex["pred"][None], original_size,
            mask_inputs=None if mi is None else mi[None])
        return out[0], scores[0], logits

    def _extract_prompts(self, qry, logits):
        """Per-slice device-side prompt extraction: coarse logits -> CCA ->
        points/boxes + the preprocessed SAM input image.  No SAM weights are
        touched, so the volume path can vmap this and batch the encoder
        natively."""
        cfg = self.config

        # resize query + logits into the SAM frame (reference :592-594).
        # The logit upsample + softmax + argmax run in f32 at true-f32
        # matmul precision regardless of the model dtype: the argmax
        # threshold is what seeds CCA and every prompt, so bf16
        # interpolation rounding here moves mask boundaries for free (the
        # resize einsums at DEFAULT precision multiply as single-pass bf16
        # even on f32 operands; 2 channels — the scope costs nothing).
        qimg = resize_bilinear(qry, cfg.image_size)
        with jax.default_matmul_precision("highest"):
            logits_hi = resize_bilinear(logits.astype(jnp.float32),
                                        cfg.image_size)
        probs = jax.nn.softmax(logits_hi, axis=1)
        pred = jnp.argmax(probs, axis=1)[0].astype(jnp.float32)

        stats = connected_components(pred, cfg.max_ccs)
        conf = component_confidences(stats, probs[0, 1], pred)
        if cfg.use_cca:
            # cca mode keeps a single component at slot 0 — shrink the stats
            # to one row BEFORE prompt extraction so the per-component
            # top-k / dilation work doesn't run 8x dead lanes
            stats, conf = _keep_best_component(stats, conf)
            stats = ComponentStats(
                labels=stats.labels, num=stats.num, valid=stats.valid[:1],
                areas=stats.areas[:1], bboxes=stats.bboxes[:1],
                centroids=stats.centroids[:1])

        pts = build_sam_prompts(
            probs[0, 1], probs[0, 0], stats,
            num_points=cfg.num_points_for_sam, point_mode=cfg.point_mode,
            use_neg_points=cfg.use_neg_points) if cfg.use_points else None
        boxes = stats.bboxes.astype(jnp.float32) if cfg.use_bbox else None

        k_eff = stats.valid.shape[0]
        coords = pts.coords if pts is not None else jnp.zeros((k_eff, 1, 2))
        labels = pts.labels if pts is not None else -jnp.ones(
            coords.shape[:2], jnp.int32)
        valid = stats.valid

        mask_inputs = None
        if cfg.use_mask:
            # per-component low-res mask prompts (4× the embedding grid,
            # 256² at the production frame), fg->10 / bg->-8 (reference
            # predict_w_masks, ProtoSAM.py:468-479; its uint8 cast wraps -8
            # to 248 — a bug we do not copy, see PARITY.md)
            k = valid.shape[0]
            side = 4 * (self.sam_model.image_size
                        // self.sam_model.vit_patch_size)
            onehot = (stats.labels[None] ==
                      jnp.arange(1, k + 1, dtype=jnp.int32)[:, None, None])
            low = resize_nearest(onehot.astype(jnp.float32)[:, None],
                                 (side, side))[:, 0]
            bg_fill = 248.0 if cfg.mask_prompt_uint8_wrap else -8.0
            mask_inputs = jnp.where(low > 0.5, 10.0, bg_fill)[..., None]

        # --- SAM input image: the reference's uint8 min-max renorm quirk ---
        # (ProtoSAM.py:651-660): sam_trans with mean 0/std 1 (identity), then
        # min-max scale to [0,255] and uint8 truncation, then the predictor's
        # own ImageNet-stats normalization (predictor.py:34-60 + sam.py:163).
        q = qimg[0].transpose(1, 2, 0)  # HWC
        q = (q - q.min()) / (q.max() - q.min()) * 255.0
        q = jnp.floor(q).astype(jnp.float32)
        q = sam_preprocess(q[None], self.sam_model.image_size,
                           DEFAULT_PIXEL_MEAN, DEFAULT_PIXEL_STD)[0]

        return {"sam_image": q, "coords": coords, "labels": labels,
                "boxes": boxes, "valid": valid, "pred": pred,
                "mask_inputs": mask_inputs}

    def _decode_stage(self, sam_params, emb, coords, labels, boxes, valid,
                      pred, original_size, mask_inputs=None):
        """Batched SAM decode over (B slices × K components).

        emb (B, 64, 64, 256); coords (B, K, P, 2); labels (B, K, P);
        boxes (B, K, 4) | None; valid (B, K); pred (B, Hs, Ws).
        Returns (out (B, H, W), scores (B, K)).
        """
        cfg = self.config
        b, k = coords.shape[:2]
        emb_rep = jnp.repeat(emb, k, axis=0)                   # (B*K, ...)
        flat = lambda x: x.reshape((b * k,) + x.shape[2:])

        if cfg.use_mask and mask_inputs is not None:
            # mask-prompt mode (reference predict_w_masks :468-498): no
            # point/box tokens, multimask output, best score per component
            low_res, iou = self.sam_model.apply(
                {"params": sam_params}, emb_rep,
                jnp.zeros((b * k, 0, 2)), jnp.zeros((b * k, 0), jnp.int32),
                None, flat(mask_inputs), True, False,
                method=self.sam_model.decode)
            best = jnp.argmax(iou, axis=1)
            low_best = jnp.take_along_axis(
                low_res, best[:, None, None, None], axis=1)[:, 0]
            masks_low = low_best.reshape(b, k, *low_res.shape[-2:])
            scores = jnp.take_along_axis(iou, best[:, None],
                                         axis=1)[:, 0].reshape(b, k)
        else:
            # multimask unless cca mode (reference predict_w_points_bbox:522);
            # best_pred_idx = 0 either way (:525)
            low_res, iou = self.sam_model.apply(
                {"params": sam_params}, emb_rep, flat(coords), flat(labels),
                None if boxes is None else flat(boxes), None,
                not cfg.use_cca, boxes is None, method=self.sam_model.decode)
            masks_low = low_res[:, 0].reshape(b, k, *low_res.shape[-2:])
            scores = iou[:, 0].reshape(b, k)

        # postprocess: BILINEAR to the SAM frame.  The reference runs TWO sam
        # packages: ProtoSAM drives the pip predictor (requirements.txt:57
        # segment-anything==1.0; ProtoSAM.py:8), whose postprocess_masks is
        # upstream bilinear — while the VENDORED fork it also ships changed
        # it to nearest (models/segment_anything/modeling/sam.py:154-160) and
        # backs only SamWrapper.  This pipeline matches the pip path; the
        # golden harness (tests/test_pipeline_golden.py) restores upstream
        # bilinear on the mounted fork for the same reason.  Crop is identity
        # at square inputs; then threshold at 0 and OR over components.
        # The SAM-frame bilinear and the final nearest resize to the query
        # frame (reference :676) are COMPOSED into one row-selected matmul
        # pair — same taps/weights as the two-step form, ~1 ulp (nearest =
        # row selection; ops/resize.resize_bilinear_then_nearest) — and it
        # never materializes the (B, K, 1024, 1024) f32 intermediate.
        masks = resize_bilinear_then_nearest(
            masks_low, (self.sam_model.image_size,) * 2, original_size)
        bin_masks = (masks > 0.0) & valid[:, :, None, None]
        summed = jnp.any(bin_masks, axis=1).astype(jnp.float32)

        # empty coarse pred -> return the coarse argmax directly
        # (reference :612-613), here as a device-side select (the where
        # commutes with the per-element nearest selection, so selecting
        # AFTER the per-branch resizes is exact)
        empty = jnp.max(pred, axis=(1, 2)) == 0
        pred_out = resize_nearest(pred[:, None], original_size)[:, 0]
        out = jnp.where(empty[:, None, None], pred_out, summed)
        scores = jnp.where(empty[:, None], 0.0, scores * valid)
        return out, scores

    # ---- batched volume mode (the TPU throughput path) --------------------

    def _volume_core(self, coarse_params, sam_params, supp, fg, bg, qrys,
                     supp_fts, val_wsize):
        """One XLA program per slice batch: the coarse model and both SAM
        stages run natively batched over slices (the encoders see the full
        batch — no vmap around the Pallas flash-attention kernel), while the
        per-slice CCA/prompt math is vmapped.

        The support set is encoded ONCE per volume (the reference re-encodes
        it with every slice, grid_proto_fewshot.py:181-184 — encoding is
        per-sample so caching is numerically identical).
        """
        out = self.coarse_model.apply(
            {"params": coarse_params}, supp, fg, bg, qrys, True,
            val_wsize, supp_fts=supp_fts)
        logits = out["logits"]                      # (N, 2, H, W)
        ex = jax.vmap(self._extract_prompts)(qrys[:, None],
                                             logits[:, None])
        embs = self.sam_model.apply({"params": sam_params},
                                    ex["sam_image"],
                                    method=self.sam_model.encode_image)
        preds, scores = self._decode_stage(
            sam_params, embs, ex["coords"], ex["labels"], ex["boxes"],
            ex["valid"], ex["pred"], qrys.shape[-2:],
            mask_inputs=ex.get("mask_inputs"))
        # do NOT return the coarse logits: materializing the unused
        # (N, 2, H, W) f32 output costs ~90 MB/batch-24 of HBM writes
        # and pins intermediates XLA could otherwise fuse away
        return preds, scores

    @functools.cached_property
    def _jit_volume(self):
        return jax.jit(self._volume_core, static_argnames=("val_wsize",),
                       compiler_options=_xla_opts(self.sam_model))

    def _jit_volume_dp(self, mesh):
        """Slice-data-parallel volume program via ``jax.shard_map``: each
        chip runs the complete per-slice pipeline on its local shard with
        ZERO cross-chip collectives (pinned by
        tests/test_sharded_eval.py::test_dp_volume_program_has_no_collectives).

        GSPMD (plain jit over sharded inputs) is NOT used here on purpose:
        the CCA fixpoint is a ``lax.while_loop``, and under GSPMD its
        convergence flag becomes a global OR — one cross-chip all-reduce
        per label-propagation iteration, and every chip iterates until the
        slowest mask on the POD converges.  shard_map keeps the loop
        condition chip-local.  Tensor parallelism (shard_params=True) still
        goes through GSPMD, which propagates the Megatron specs.
        """
        cache = getattr(self, "_dp_cache", None)
        if cache is None:
            cache = self._dp_cache = {}
        if mesh not in cache:
            from jax.sharding import PartitionSpec as P

            def volume_dp(coarse_params, sam_params, supp, fg, bg, qrys,
                          supp_fts, val_wsize):
                fn = functools.partial(self._volume_core,
                                       val_wsize=val_wsize)
                shd = jax.shard_map(
                    fn, mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P(), P("data"), P()),
                    out_specs=(P("data"), P("data")),
                    check_vma=False)
                return shd(coarse_params, sam_params, supp, fg, bg, qrys,
                           supp_fts)

            cache[mesh] = jax.jit(volume_dp, static_argnames=("val_wsize",))
        return cache[mesh]

    @functools.cached_property
    def _jit_supp_fts(self):
        def enc(coarse_params, supp):
            return self.coarse_model.apply({"params": coarse_params}, supp,
                                           method=self.coarse_model.get_features)
        return jax.jit(enc)

    def forward_volume(self, queries, coarse_model_input: ALPNetInput,
                       slice_batch: int = 8):
        """Segment a full slice stack: queries (N, 3, H, W) ->
        (preds (N, H, W), scores (N, max_ccs)).

        Pads N up to a multiple of ``slice_batch`` so the program compiles
        once per batch shape.
        """
        inp = coarse_model_input
        supp_fts = inp.supp_fts
        if supp_fts is None:
            supp_fts = self._jit_supp_fts(self.coarse_params, inp.supp_imgs)
        n = queries.shape[0]
        pad = (-n) % slice_batch
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.repeat(queries[-1:], pad, axis=0)], axis=0)
        preds, scores = [], []
        for i in range(0, queries.shape[0], slice_batch):
            p, s = self._jit_volume(
                self.coarse_params, self.sam_params, inp.supp_imgs,
                inp.fore_mask, inp.back_mask, queries[i:i + slice_batch],
                supp_fts, inp.val_wsize)
            preds.append(p)
            scores.append(s)
        preds = jnp.concatenate(preds, axis=0)[:n]
        scores = jnp.concatenate(scores, axis=0)[:n]
        return preds, scores

    def forward_volume_sharded(self, queries, coarse_model_input: ALPNetInput,
                               mesh, slice_batch: int | None = None,
                               shard_params: bool = False):
        """Multi-chip volume inference: slices sharded over the mesh 'data'
        axis.  The dp path runs under ``jax.shard_map`` — each chip executes
        the complete per-slice pipeline locally with zero collectives (see
        _jit_volume_dp for why GSPMD is wrong for the CCA while-loop).  The
        reference has no distributed path at all (SURVEY.md §2.6); the
        z-stack is embarrassingly parallel.

        ``shard_params=True`` additionally Megatron-shards both encoders'
        transformer kernels over the mesh 'model' axis
        (parallel.encoder_param_sharding) — tensor parallelism on the
        inference path for models too big to replicate per chip; this path
        uses GSPMD (jit over sharded operands), which propagates the
        Megatron specs and inserts the row-parallel all-reduces.

        queries (N, 3, H, W); N is padded to a multiple of the data-axis
        size.  Returns (preds (N, H, W), scores).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        inp = coarse_model_input
        supp_fts = inp.supp_fts
        if supp_fts is None:
            supp_fts = self._jit_supp_fts(self.coarse_params, inp.supp_imgs)
        n = queries.shape[0]
        n_data = mesh.shape["data"]
        batch = slice_batch or n_data
        batch = -(-batch // n_data) * n_data
        pad = (-n) % batch
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.repeat(queries[-1:], pad, axis=0)], axis=0)
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        put = functools.partial(jax.device_put, device=repl)
        # param placement is cached per (mesh, shard_params): replicating
        # (or Megatron-sharding) the full param trees costs a host->device
        # copy of every weight — paying it once per volume instead of once
        # per mesh doubled the dp program's measured wall time on the
        # DP_SCALING harness
        cache = getattr(self, "_mesh_params_cache", None)
        if cache is None:
            cache = self._mesh_params_cache = {}
        key = (mesh, shard_params)
        if key not in cache:
            if shard_params:
                from protosam_tpu.parallel import encoder_param_sharding

                cache[key] = (
                    jax.device_put(
                        self.coarse_params,
                        encoder_param_sharding(self.coarse_params, mesh)),
                    jax.device_put(
                        self.sam_params,
                        encoder_param_sharding(self.sam_params, mesh)))
            else:
                cache[key] = (jax.device_put(self.coarse_params, repl),
                              jax.device_put(self.sam_params, repl))
        coarse_p, sam_p = cache[key]
        args = (coarse_p, sam_p,
                put(inp.supp_imgs), put(inp.fore_mask), put(inp.back_mask))
        supp_fts = jax.device_put(supp_fts, repl)
        vol_fn = (self._jit_volume if shard_params
                  else self._jit_volume_dp(mesh))
        preds, scores = [], []
        for i in range(0, queries.shape[0], batch):
            q = jax.device_put(queries[i:i + batch], shard)
            p, s = vol_fn(*args, q, supp_fts, inp.val_wsize)
            preds.append(p)
            scores.append(s)
        return (jnp.concatenate(preds, axis=0)[:n],
                jnp.concatenate(scores, axis=0)[:n])

    # ---- public API -------------------------------------------------------

    def forward(self, query_image, coarse_model_input: ALPNetInput,
                degrees_rotate: int = 0):
        """(pred (H, W), scores (max_ccs,)) — reference ProtoSAM.forward.

        degrees_rotate != 0 applies the rotate-expand-resize TTA of reference
        ProtoSAM.py:543-556: the coarse logits are computed on the rotated
        query and un-rotated before prompt extraction.
        """
        from protosam_tpu.ops.rotate import reverse_tensor, rotate_tensor_no_crop

        inp = coarse_model_input
        if degrees_rotate != 0:
            rotated, (rh, rw) = rotate_tensor_no_crop(
                jnp.asarray(query_image), degrees_rotate)
            inp.set_query_images(rotated)
            logits_rot = self._jit_coarse(
                self.coarse_params, inp.supp_imgs, inp.fore_mask,
                inp.back_mask, inp.qry_imgs, inp.supp_fts,
                isval=inp.isval, val_wsize=inp.val_wsize)
            logits = reverse_tensor(logits_rot, int(rh), int(rw),
                                    -degrees_rotate)
            inp.set_query_images(query_image)
            pred, scores, _ = self._jit_refine(
                self.sam_params, jnp.asarray(query_image), logits)
            return pred, scores

        inp.set_query_images(query_image)
        supp_fts = inp.supp_fts
        pred, scores, _ = self._jit_forward(
            self.coarse_params, self.sam_params, inp.supp_imgs, inp.fore_mask,
            inp.back_mask, inp.qry_imgs, supp_fts,
            isval=inp.isval, val_wsize=inp.val_wsize)
        return pred, scores

    __call__ = forward


def _confidence_from_logits(logits: jax.Array) -> jax.Array:
    """Reference util/utils.py:429-434."""
    probs = jax.nn.softmax(logits, axis=1)[:, 1].reshape(-1)
    pred = (probs >= 0.5).astype(jnp.float32)
    return (probs * pred).sum() / (pred.sum() + 1e-6)
