"""ALPNet-only evaluation driver (reference validation.py:100-367).

Per test class: pick 3-chunk support, stream the fold's slices, run the
coarse model (optionally with CCA keep-best and test-time training),
reassemble 3D prediction volumes, record scan-level TP/FP/FN inside the
z-margin window, write NIfTI predictions, report class/mean Dice/Prec/Rec.

The coarse model runs as one jitted function; slices of a (class, chunk)
group are batched for TPU throughput.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from protosam_tpu.data.dataset_registry import DATASET_INFO
from protosam_tpu.data.medical import med_fewshot_val
from protosam_tpu.data.nifti import write_nii
from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.ops.cca import (
    component_confidences,
    connected_components,
    keep_most_confident,
)
from protosam_tpu.ops.resize import resize_nearest
from protosam_tpu.utils.config import Config
from protosam_tpu.utils.metrics import Metric

log = logging.getLogger("alpnet_eval")


def coarse_predict_fn(model: FewShotSeg, do_cca: bool, max_ccs: int = 8):
    """Jitted: support + queries -> per-slice class predictions."""

    def fn(params, supp, fg, bg, qrys, val_wsize):
        def one(qry):
            out = model.apply({"params": params}, supp, fg, bg, qry[None],
                              True, val_wsize)
            logits = out["logits"]
            pred = jnp.argmax(logits, axis=1)[0].astype(jnp.float32)
            if do_cca:
                stats = connected_components(pred, max_ccs)
                probs = jax.nn.softmax(logits, axis=1)
                conf = component_confidences(stats, probs[0, 1], pred)
                # reference validation.py:291-295 multiplies the argmax pred
                # by the best-component mask (utils.cca return path)
                pred = pred * keep_most_confident(stats, conf)
            return pred

        return jax.vmap(one)(qrys)

    return jax.jit(fn, static_argnames=("val_wsize",))


def run_alpnet_eval(cfg: Config, model: FewShotSeg | None = None,
                    params=None, slice_batch: int | None = None,
                    write_preds: bool = True) -> dict:
    baseset = cfg.dataset.split("_")[0]
    info = DATASET_INFO[baseset]
    test_labels = sorted(info["LABEL_GROUP"]["pa_all"]
                         - info["LABEL_GROUP"][cfg.label_sets])
    max_label = len(info["REAL_LABEL_NAME"]) - 1
    slice_batch = slice_batch or cfg.slice_batch

    suffix = "_672" if cfg.input_size[0] > 256 else ""
    data_key = baseset + suffix if baseset + suffix in cfg.data_dirs \
        else cfg.dataset
    te_dataset, te_parent = med_fewshot_val(
        dataset_name=baseset, base_dir=cfg.data_dir(data_key),
        idx_split=cfg.eval_fold, act_labels=test_labels,
        npart=cfg.n_sup_part, image_size=cfg.input_size[0],
        use_clahe=cfg.use_clahe, use_3_slices=cfg.use_3_slices)

    if model is None:
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        model = FewShotSeg(image_size=cfg.input_size[0],
                           which_model=cfg.modelname,
                           proto_grid_size=cfg.proto_grid_size, dtype=dtype)
    if params is None:
        hw = cfg.input_size[0]
        dummy = jnp.zeros((1, 3, hw, hw))
        m = jnp.zeros((1, hw, hw)).at[:, hw // 3:hw // 2,
                                      hw // 3:hw // 2].set(1.0)
        params = model.init(jax.random.PRNGKey(cfg.seed), dummy, m, 1 - m,
                            dummy)["params"]
        if cfg.reload_model_path:
            from protosam_tpu.utils.checkpoint import load_params
            params = load_params(cfg.reload_model_path, params)

    predict = coarse_predict_fn(model, cfg.do_cca, cfg.max_ccs)

    metric = Metric(max_label=max_label,
                    n_scans=len(te_parent.pid_curr_load) - 1)
    save_pred_buffer = {}

    for curr_lb in test_labels:
        te_dataset.set_curr_cls(curr_lb)
        sup = te_parent.get_support(curr_class=curr_lb, class_idx=[curr_lb],
                                    scan_idx=cfg.support_idx,
                                    npart=cfg.n_sup_part)
        sup_imgs = [jnp.asarray(x) for x in sup["support_images"][0]]
        sup_fg = [jnp.asarray(m["fg_mask"]) for m in sup["support_mask"][0]]
        sup_bg = [jnp.asarray(m["bg_mask"]) for m in sup["support_mask"][0]]

        # gather query slices per scan
        by_scan: dict[str, list[dict]] = defaultdict(list)
        for idx in range(len(te_dataset)):
            s = te_dataset[idx]
            if s["scan_id"] in te_parent.potential_support_sid:
                continue
            by_scan[s["scan_id"]].append(s)

        _lb_buffer = {}
        for scan_count, (scan_id, slices) in enumerate(by_scan.items()):
            nz = len(te_parent.scan_z_idx[scan_id])
            vol_pred = np.full((cfg.input_size[0], cfg.input_size[1], nz),
                               np.nan)
            # group kept slices by support chunk
            groups: dict[int, list[dict]] = defaultdict(list)
            for s in slices:
                keep = (s["label"].max() >= 1 or s["is_end"]
                        or not cfg.skip_no_organ_slices)
                if not keep:
                    continue
                groups[int(s["part_assign"])].append(s)
            for qpart, ss in groups.items():
                qrys = jnp.asarray(np.stack([x["image"] for x in ss]))
                sup_i = (sup_imgs[qpart][None] if sup_imgs[qpart].ndim == 3
                         else sup_imgs[qpart])
                sup_f = (sup_fg[qpart][None] if sup_fg[qpart].ndim == 2
                         else sup_fg[qpart])
                sup_b = (sup_bg[qpart][None] if sup_bg[qpart].ndim == 2
                         else sup_bg[qpart])
                preds = predict(params, sup_i, sup_f, sup_b, qrys,
                                cfg.val_wsize)
                if cfg.ttt:
                    # test-time training per slice on the coarse pred, then
                    # re-predict; restore params afterwards when
                    # reset_after_slice (reference validation.py:273-281)
                    from protosam_tpu.eval.ttt import test_time_training

                    new_preds = []
                    ttt_params = params
                    for x, p0 in zip(ss, np.asarray(preds)):
                        ttt_params = test_time_training(
                            model, ttt_params if not cfg.reset_after_slice
                            else params,
                            np.asarray(x["image"]), p0.astype(np.float32),
                            which_aug=cfg.which_aug, lr=cfg.lr,
                            optim_type=cfg.optim_type, seed=cfg.seed)
                        new_preds.append(np.asarray(predict(
                            ttt_params, sup_i, sup_f, sup_b,
                            jnp.asarray(x["image"])[None],
                            cfg.val_wsize))[0])
                    preds = jnp.asarray(np.stack(new_preds))
                preds = np.asarray(
                    resize_nearest(jnp.asarray(preds)[:, None],
                                   ss[0]["label"].shape)[:, 0])
                for s, p in zip(ss, preds):
                    vol_pred[..., s["z_id"]] = p
                    in_margin = (s["z_id"] - s["z_max"] <= cfg.z_margin and
                                 s["z_id"] - s["z_min"] >= -cfg.z_margin)
                    if in_margin and not s["is_end"]:
                        metric.record(p, s["label"], labels=[curr_lb],
                                      n_scan=scan_count)
            _lb_buffer[scan_id] = vol_pred.transpose(2, 0, 1)
        save_pred_buffer[str(curr_lb)] = _lb_buffer

    if write_preds and cfg.log_dir:
        outdir = os.path.join(cfg.log_dir, "interm_preds")
        os.makedirs(outdir, exist_ok=True)
        for lb, preds in save_pred_buffer.items():
            for scan_id, p in preds.items():
                ref = te_parent.info_by_scan[scan_id]
                write_nii(np.nan_to_num(p * float(lb)).astype(np.float32),
                          os.path.join(outdir,
                                       f"scan_{scan_id}_label_{lb}.nii.gz"),
                          ref=ref)

    cls_dice, _, mean_dice, _, raw_dice = metric.get_mDice(
        labels=sorted(test_labels), give_raw=True)
    pr = metric.get_mPrecRecall(labels=sorted(test_labels), give_raw=True)
    result = {
        "classDice": dict(zip(map(str, sorted(test_labels)),
                              map(float, cls_dice))),
        "meanDice": float(mean_dice),
        "classPrec": dict(zip(map(str, sorted(test_labels)),
                              map(float, pr[0]))),
        "meanPrec": float(pr[2]),
        "classRec": dict(zip(map(str, sorted(test_labels)),
                             map(float, pr[4]))),
        "meanRec": float(pr[6]),
    }
    log.info("mean Dice: %.4f", result["meanDice"])
    return result
