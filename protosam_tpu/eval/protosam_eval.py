"""ProtoSAM evaluation driver (reference validation_protosam.py:285-451).

Flow: build coarse+SAM models, load the fold's volumes, pick the support
set once per run (3 z-chunks; swapped per query's part_assign), loop query
slices, compute per-slice dice/iou/prec/recall, aggregate per case and
overall.

Two execution modes:
  * ``per_slice`` — faithful reference loop (one slice per step);
  * ``volume``    — TPU throughput path: all queries of a z-chunk batched
                    through one jitted program (identical numerics).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from protosam_tpu.data.dataset_registry import DATASET_INFO, ORGAN_CLASS
from protosam_tpu.data.medical import med_fewshot_val
from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.io_protocol import ALPNetInput
from protosam_tpu.models.sam import build_sam
from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
from protosam_tpu.utils.config import Config
from protosam_tpu.utils.detection import get_bounding_box
from protosam_tpu.utils.metrics import dice_iou_precision_recall

log = logging.getLogger("protosam_eval")

SAM_VERSIONS = {"sam_h": "vit_h", "sam_b": "vit_b", "sam_l": "vit_l",
                "vit_h": "vit_h", "vit_b": "vit_b", "vit_t": "vit_t",
                "medsam": "vit_b"}


def build_models(cfg: Config, coarse_params=None, sam_params=None):
    import jax

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    coarse = FewShotSeg(image_size=cfg.input_size[0],
                        which_model=cfg.modelname,
                        proto_grid_size=cfg.proto_grid_size, dtype=dtype,
                        use_fused_alp=cfg.use_fused_alp,
                        quant_dense=cfg.quant_dense)
    sam = build_sam(SAM_VERSIONS[cfg.protosam_sam_ver], dtype=dtype,
                    quant_dense=cfg.quant_dense)

    rng = jax.random.PRNGKey(cfg.seed)
    if coarse_params is None:
        hw = cfg.input_size[0]
        dummy = jnp.zeros((1, 3, hw, hw))
        mask = jnp.zeros((1, hw, hw)).at[:, hw // 3:hw // 2,
                                         hw // 3:hw // 2].set(1.0)
        coarse_params = coarse.init(rng, dummy, mask, 1 - mask,
                                    dummy)["params"]
        if cfg.reload_model_path:
            from protosam_tpu.utils.checkpoint import load_params
            coarse_params = load_params(cfg.reload_model_path, coarse_params)
    if sam_params is None:
        sam_params = sam.init(
            rng, jnp.zeros((1, sam.image_size, sam.image_size, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
            jnp.zeros((1, 4)))["params"]

    if cfg.protosam_sam_ver == "medsam":
        # bbox-only prompts into MedSAM (reference validation_protosam.py
        # :216-238 builds ProtoMedSAM for this setting)
        from protosam_tpu.pipeline import ProtoMedSAM

        pconf = ProtoSAMConfig(
            image_size=(sam.image_size, sam.image_size),
            use_points=False, use_bbox=True, use_cca=cfg.do_cca,
            coarse_pred_only=cfg.coarse_pred_only, max_ccs=cfg.max_ccs)
        return ProtoMedSAM(coarse, coarse_params, sam, sam_params, pconf)

    pconf = ProtoSAMConfig(
        image_size=(sam.image_size, sam.image_size),
        num_points_for_sam=1,
        use_points=cfg.use_points,
        use_bbox=cfg.use_bbox,
        use_mask=cfg.use_mask,
        use_neg_points=cfg.use_neg_points,
        use_cca=cfg.do_cca,
        point_mode=cfg.point_mode,
        coarse_pred_only=cfg.coarse_pred_only,
        max_ccs=cfg.max_ccs,
    )
    return ProtoSAM(coarse, coarse_params, sam, sam_params, pconf)


def resolve_test_class(cfg: Config) -> int:
    base = cfg.dataset.split("_")[0]
    return ORGAN_CLASS[base][cfg.curr_cls]


def run_eval(cfg: Config, pipe: ProtoSAM | None = None,
             mode: str = "volume", profile: bool = False) -> dict:
    if cfg.base_model.upper() == "SAM":
        return run_eval_sam_oracle(cfg)
    if cfg.dataset.lower() == "polyps":
        return run_eval_polyp(cfg, pipe)
    base = cfg.dataset.split("_")[0]
    suffix = "_672" if cfg.input_size[0] > 256 else ""
    data_key = base + suffix if base + suffix in cfg.data_dirs else cfg.dataset
    te_dataset, te_parent = med_fewshot_val(
        dataset_name=base,
        base_dir=cfg.data_dir(data_key),
        idx_split=cfg.eval_fold,
        act_labels=sorted(DATASET_INFO[base]["LABEL_GROUP"]["pa_all"]),
        npart=cfg.n_sup_part,
        image_size=cfg.input_size[0],
        use_clahe=cfg.use_clahe,
        use_3_slices=cfg.use_3_slices,
    )
    curr_cls = resolve_test_class(cfg)
    te_dataset.set_curr_cls(curr_cls)

    pipe = pipe or build_models(cfg)

    sup = te_dataset.get_support_set(
        {"support_idx": cfg.support_idx, "task": cfg.task})
    all_sup_imgs, all_sup_masks = sup["support_images"], sup["support_labels"]
    support_scan_ids = set(sup["support_scan_id"])

    mean_dice, mean_prec, mean_rec, mean_iou = [], [], [], []
    dice_cases, iou_cases = defaultdict(list), defaultdict(list)
    bboxes_w_scores = []

    from protosam_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    t0 = time.time()
    n_slices = 0

    # group queries by part_assign so each support swap batches its chunk
    chunks: dict[int, list[dict]] = defaultdict(list)
    for idx in range(len(te_dataset)):
        s = te_dataset[idx]
        if s["scan_id"] in support_scan_ids:
            continue  # reference :364 skips support scans as queries
        if cfg.skip_no_organ_slices and s["label"].max() < 1:
            continue
        chunks[int(s["part_assign"])].append(s)

    for qpart in sorted(chunks):
        samples = chunks[qpart]
        sup_img = jnp.asarray(all_sup_imgs[qpart])[None] \
            if np.asarray(all_sup_imgs[qpart]).ndim == 3 \
            else jnp.asarray(all_sup_imgs[qpart])
        sup_msk = jnp.asarray(all_sup_masks[qpart])
        if sup_msk.ndim == 2:
            sup_msk = sup_msk[None]
        inp = ALPNetInput(sup_img, sup_msk,
                          jnp.asarray(samples[0]["image"])[None],
                          isval=True, val_wsize=cfg.val_wsize)

        if mode == "volume":
            queries = jnp.asarray(np.stack([s["image"] for s in samples]))
            with timer.stage(f"volume_chunk"):
                preds, scores = pipe.forward_volume(
                    queries, inp, slice_batch=cfg.slice_batch)
                preds = np.asarray(preds)
        else:
            preds = []
            for s in samples:
                pred, _ = pipe.forward(jnp.asarray(s["image"])[None], inp)
                preds.append(np.asarray(pred))
            preds = np.stack(preds)

        for s, pred in zip(samples, preds):
            m = dice_iou_precision_recall(pred, s["label"])
            mean_dice.append(m["dice"])
            mean_prec.append(m["precision"])
            mean_rec.append(m["recall"])
            mean_iou.append(m["iou"])
            dice_cases[s["case"]].append(m["dice"])
            iou_cases[s["case"]].append(m["iou"])
            bboxes_w_scores.append({
                "pred_bbox": get_bounding_box(pred),
                "gt_bbox": get_bounding_box(s["label"]),
                "score": m["dice"]})
            n_slices += 1

    elapsed = time.time() - t0
    result = {
        "mar_val_batches_meanDice": float(np.mean(mean_dice)),
        "mar_val_batches_meanPrec": float(np.mean(mean_prec)),
        "mar_val_al_batches_meanRec": float(np.mean(mean_rec)),
        "mar_val_al_batches_meanIOU": float(np.mean(mean_iou)),
        "cases": {k: {"meanDice": float(np.mean(v)),
                      "meanIOU": float(np.mean(iou_cases[k]))}
                  for k, v in dice_cases.items()},
        "n_slices": n_slices,
        "slices_per_sec": n_slices / elapsed if elapsed > 0 else 0.0,
    }
    if profile:
        result["stage_timings"] = timer.as_dict()
        log.info("stage timings:\n%s", timer.report())
    if bboxes_w_scores:
        from protosam_tpu.utils.detection import eval_detection

        result["detection_f1"] = eval_detection(bboxes_w_scores).to_dict(
            orient="records")
    log.info("mar_val batches meanDice: %.4f (%d slices, %.1f slices/s)",
             result["mar_val_batches_meanDice"], n_slices,
             result["slices_per_sec"])
    if cfg.log_dir:
        os.makedirs(cfg.log_dir, exist_ok=True)
        # config snapshot per run (the reference's sacred FileStorageObserver
        # records config + sources, config_ssl_upload.py:171-177)
        cfg.save(os.path.join(cfg.log_dir, "config.json"))
        cfg.snapshot_sources(cfg.log_dir)
        with open(os.path.join(cfg.log_dir, "protosam_eval_result.json"),
                  "w") as f:
            json.dump(result, f, indent=2)
    return result


def run_eval_sam_oracle(cfg: Config, wrapper=None) -> dict:
    """base_model=SAM oracle baseline (reference ProtoSAM.py:170-179 +
    SamWrapper.py): generate all masks per slice, pick best-vs-GT, score."""
    import jax

    from protosam_tpu.models.samwrapper import SamWrapper

    base = cfg.dataset.split("_")[0]
    suffix = "_672" if cfg.input_size[0] > 256 else ""
    data_key = base + suffix if base + suffix in cfg.data_dirs else cfg.dataset
    te_dataset, te_parent = med_fewshot_val(
        dataset_name=base, base_dir=cfg.data_dir(data_key),
        idx_split=cfg.eval_fold,
        act_labels=sorted(DATASET_INFO[base]["LABEL_GROUP"]["pa_all"]),
        npart=cfg.n_sup_part, image_size=cfg.input_size[0],
        use_clahe=cfg.use_clahe, use_3_slices=cfg.use_3_slices)
    te_dataset.set_curr_cls(resolve_test_class(cfg))

    if wrapper is None:
        sam = build_sam(SAM_VERSIONS.get(cfg.protosam_sam_ver, "vit_b"),
                        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16"
                        else jnp.float32)
        params = sam.init(
            jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, sam.image_size, sam.image_size, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
            jnp.zeros((1, 4)))["params"]
        if cfg.reload_model_path:
            from protosam_tpu.utils.checkpoint import load_params
            params = load_params(cfg.reload_model_path, params)
        wrapper = SamWrapper(sam, params)

    dice_list, cases = [], defaultdict(list)
    for idx in range(len(te_dataset)):
        s = te_dataset[idx]
        if cfg.skip_no_organ_slices and s["label"].max() < 1:
            continue
        img = np.asarray(s["image"]).transpose(1, 2, 0)
        img = ((img - img.min()) / (img.max() - img.min() + 1e-9) * 255
               ).astype(np.uint8)
        pred = wrapper(img, s["label"])
        m = dice_iou_precision_recall(pred, s["label"])
        dice_list.append(m["dice"])
        cases[s["case"]].append(m["dice"])
    return {
        "mar_val_batches_meanDice": float(np.mean(dice_list))
        if dice_list else float("nan"),
        "cases": {k: {"meanDice": float(np.mean(v))} for k, v in
                  cases.items()},
        "n_slices": len(dice_list),
    }


def run_eval_polyp(cfg: Config, pipe: ProtoSAM | None = None) -> dict:
    """Polyp one-shot eval (reference validation_protosam.py:244-249,
    307-313): support sampled from the train split, queries from test."""
    from protosam_tpu.data.polyp import PolypDataset

    sam_frame = cfg.input_size[0] if cfg.input_size[0] >= 256 else 1024
    tr = PolypDataset(cfg.data_dir("polyps"), train=True,
                      image_size=sam_frame, seed=cfg.seed)
    te = PolypDataset(cfg.data_dir("polyps"), train=False,
                      image_size=sam_frame, seed=cfg.seed)
    pipe = pipe or build_models(cfg)

    sup_imgs, sup_gts, _ = tr.get_support(
        n_support=cfg.n_support, text_file=cfg.support_txt_file)
    sup_img = jnp.asarray(np.concatenate(sup_imgs, axis=0))
    sup_msk = jnp.asarray(np.concatenate(sup_gts, axis=0))

    mean_dice, mean_prec, mean_rec, mean_iou = [], [], [], []
    cases = defaultdict(list)
    t0 = time.time()
    for i in range(len(te)):
        s = te[i]
        inp = ALPNetInput(sup_img, sup_msk, jnp.asarray(s["image"])[None],
                          isval=True, val_wsize=cfg.val_wsize)
        pred, _ = pipe.forward(jnp.asarray(s["image"])[None], inp)
        m = dice_iou_precision_recall(np.asarray(pred), s["label"])
        mean_dice.append(m["dice"])
        mean_prec.append(m["precision"])
        mean_rec.append(m["recall"])
        mean_iou.append(m["iou"])
        cases[s["case"]].append(m["dice"])
    elapsed = time.time() - t0
    return {
        "mar_val_batches_meanDice": float(np.mean(mean_dice)),
        "mar_val_batches_meanPrec": float(np.mean(mean_prec)),
        "mar_val_al_batches_meanRec": float(np.mean(mean_rec)),
        "mar_val_al_batches_meanIOU": float(np.mean(mean_iou)),
        "cases": {k: {"meanDice": float(np.mean(v))}
                  for k, v in cases.items()},
        "n_slices": len(te),
        "slices_per_sec": len(te) / elapsed if elapsed else 0.0,
    }
