#!/usr/bin/env python3
"""Measure bf16-production-path mask drift vs the f32 strict path (PARITY.md
scopes strict reference agreement to f32; the flagship bench runs bf16 —
this records how far the bf16 masks actually move).

Two measurements, both on the REAL TPU (the bf16 path exercises the Pallas
kernels, which CPU test runs replace with einsum fallbacks):

1. --goldens: the recorded-agreement geometry (tiny seeded SAM, converted
   weights, 6 synthetic slices x cca/all configs).  Reports Dice(bf16 vs
   f32 strict) and Dice(bf16 vs the recorded reference masks).  NOTE: the
   tiny random-weight decoder's logits sit near the 0 threshold, so this is
   a WORST-CASE number (threshold-adjacent pixels flip under any rounding).
2. --bench: the flagship bench geometry (DINOv2-L + SAM vit_b, 672px,
   role-aware synthetic params, smooth CHAOS-like slices) — realistic
   activation dynamic range, the number that describes production.

Usage: python tools/measure_bf16_drift.py [--goldens] [--bench]
Prints one JSON line per measurement.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dice(a, b):
    import numpy as np

    a = np.asarray(a) > 0
    b = np.asarray(b) > 0
    denom = a.sum() + b.sum()
    return 1.0 if denom == 0 else float(2.0 * np.logical_and(a, b).sum()
                                        / denom)


def measure_goldens():
    import numpy as np
    import jax.numpy as jnp

    from tests.reference_compat import (
        AGREEMENT_BLOBS,
        build_tiny_torch_sam,
        synthetic_agreement_case,
    )

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
    from protosam_tpu.utils.torch_convert import convert_sam

    params = convert_sam(build_tiny_torch_sam().state_dict())
    golden_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "ref_masks")

    out = {}
    for tag, use_cca in (("cca", True), ("all", False)):
        preds = {}
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            sam = build_sam("vit_t", image_size=256, dtype=dt)
            pipe = ProtoSAM(None, None, sam, params,
                            ProtoSAMConfig(image_size=(256, 256), max_ccs=8,
                                           use_cca=use_cca))
            masks = []
            for i in range(len(AGREEMENT_BLOBS)):
                qry, logits = synthetic_agreement_case(i)
                pred, _s, _ = pipe._jit_refine(params, jnp.asarray(qry),
                                               jnp.asarray(logits))
                masks.append(np.asarray(pred) > 0)
            preds[dt_name] = masks
        vs_f32 = [_dice(a, b) for a, b in zip(preds["bf16"], preds["f32"])]
        ref = [np.load(os.path.join(golden_dir, f"syn_{tag}_{i:03d}.npy"))
               for i in range(len(AGREEMENT_BLOBS))]
        vs_ref = [_dice(a, b) for a, b in zip(preds["bf16"], ref)]
        out[tag] = {"dice_bf16_vs_f32": [round(d, 4) for d in vs_f32],
                    "dice_bf16_vs_reference": [round(d, 4) for d in vs_ref],
                    "min_vs_f32": round(min(vs_f32), 4),
                    "min_vs_reference": round(min(vs_ref), 4)}
    print(json.dumps({"measurement": "goldens (tiny seeded SAM, worst-case)",
                      **out}))
    return out


def measure_bench(n_slices=8):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from protosam_tpu.models.alpnet import FewShotSeg
    from protosam_tpu.models.io_protocol import ALPNetInput
    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.ops.resize import resize_bilinear
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
    from protosam_tpu.utils.synthetic import synthetic_params

    image_size = 672
    rng = jax.random.PRNGKey(0)
    supp = jax.random.normal(rng, (1, 3, image_size, image_size), jnp.float32)
    fg = jnp.zeros((1, image_size, image_size))
    q = image_size // 3
    fg = fg.at[:, q:2 * q, q:2 * q].set(1.0)
    qry0 = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 3, image_size, image_size), jnp.float32)
    low = jax.random.normal(jax.random.PRNGKey(2),
                            (n_slices, 3, 21, 21), jnp.float32)
    vol = resize_bilinear(low, (image_size, image_size)) * 3.0

    # legs: the f32-STRICT truth runs at matmul precision `highest` — the
    # MXU executes default-precision "f32" dots as single-pass bf16, which
    # is itself drift (r4 AGREEMENT forensics: a default-precision f32
    # build missed recorded reference masks at 0.975; `highest` reproduces
    # them at 0.9994).  The f32 build has no bf16 Pallas kernels, so the
    # scope is safe there.  DRIFT_INT8=1 adds the W8A8 encoder leg
    # (ops/quant) to the same comparison.
    legs = [("f32", jnp.float32, False), ("bf16", jnp.bfloat16, False)]
    if os.environ.get("DRIFT_INT8") == "1":
        legs.append(("int8", jnp.bfloat16, True))

    masks = {}
    for dt_name, dt, quant in legs:
        # the f32-strict leg runs under matmul precision `highest`, whose
        # multi-pass f32 dots blow the packed Pallas kernels' VMEM budget
        # at this geometry — route its attention through the plain XLA
        # paths (DINOv2 force_xla_attn, SAM use_flash_relpos=False); XLA
        # manages memory and honors `highest` exactly.  Production legs
        # keep the Pallas kernels.
        strict = dt_name == "f32"
        coarse = FewShotSeg(image_size=image_size, which_model="dinov2_l14",
                            dtype=dt, quant_dense=quant,
                            force_xla_attn=strict)
        sam = build_sam("vit_b", dtype=dt, image_size=1024,
                        quant_dense=quant,
                        use_flash_relpos=not strict)
        coarse_shapes = jax.eval_shape(
            lambda r: coarse.init(r, supp, fg, 1 - fg, qry0)["params"], rng)
        sam_shapes = jax.eval_shape(
            lambda r: sam.init(
                r, jnp.zeros((1, 1024, 1024, 3)), jnp.zeros((1, 1, 2)),
                jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"],
            rng)
        cp = jax.device_put(synthetic_params(coarse_shapes))
        sp = jax.device_put(synthetic_params(sam_shapes))
        pipe = ProtoSAM(coarse, cp, sam, sp,
                        ProtoSAMConfig(image_size=(1024, 1024), max_ccs=8))
        inp = ALPNetInput(supp, fg, qry0, isval=True, val_wsize=2)
        if dt_name == "f32":
            with jax.default_matmul_precision("highest"):
                inp.supp_fts = pipe._jit_supp_fts(cp, inp.supp_imgs)
                preds, _ = pipe.forward_volume(vol, inp,
                                               slice_batch=n_slices)
        else:
            inp.supp_fts = pipe._jit_supp_fts(cp, inp.supp_imgs)
            preds, _ = pipe.forward_volume(vol, inp, slice_batch=n_slices)
        masks[dt_name] = np.asarray(preds.astype(jnp.float32)) > 0
        print(f"  {dt_name}: fg fraction "
              f"{masks[dt_name].mean():.4f}", file=sys.stderr, flush=True)

    res = {"measurement": "bench geometry (dinov2_l14+vit_b 672px, "
                          "role-aware synthetic params; f32 leg at "
                          "matmul precision highest)"}
    for leg in masks:
        if leg == "f32":
            continue
        dices = [_dice(masks[leg][i], masks["f32"][i])
                 for i in range(n_slices)]
        res[f"dice_{leg}_vs_f32_per_slice"] = [round(d, 4) for d in dices]
        res[f"{leg}_min"] = round(min(dices), 4)
        res[f"{leg}_mean"] = round(sum(dices) / len(dices), 4)
    print(json.dumps(res))
    return res


def measure_refine(n_slices=6):
    """Refine-stage drift on CONTROLLED multi-component, realistic-contrast
    logit fields (r4 verdict weak #5: the full-pipeline drift runs on
    role-aware random weights whose coarse logits are near-zero-contrast
    and single-component — both unrealistic).  Here the coarse stage is
    bypassed: synthetic 672² logit fields with 2-4 gaussian components at
    trained-model contrast (|logit| ~ 6) drive CCA + prompts + SAM
    (pipe._jit_refine) in bf16-production vs f32-strict, full-size vit_b."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
    from protosam_tpu.utils.synthetic import synthetic_params

    image_size = 672
    rng = np.random.default_rng(7)

    def logit_field(i):
        """(1, 2, 672, 672) f32: k gaussian fg bumps at realistic contrast."""
        k = 2 + i % 3
        yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
        fg = np.full((image_size, image_size), -6.0, np.float32)
        for _ in range(k):
            cy, cx = rng.uniform(80, image_size - 80, 2)
            s = rng.uniform(25, 60)
            bump = 14.0 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                                   / (2 * s * s)))
            fg = np.maximum(fg, -6.0 + bump)
        fg += rng.normal(0, 0.35, fg.shape).astype(np.float32)  # boundary noise
        return np.stack([-fg, fg])[None], k

    fields, ks = zip(*[logit_field(i) for i in range(n_slices)])
    qrys = rng.standard_normal((n_slices, 1, 3, image_size, image_size)
                               ).astype(np.float32)

    masks = {}
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        strict = dt_name == "f32"
        sam = build_sam("vit_b", dtype=dt, image_size=1024,
                        use_flash_relpos=not strict)
        sam_shapes = jax.eval_shape(
            lambda r: sam.init(
                r, jnp.zeros((1, 1024, 1024, 3)), jnp.zeros((1, 1, 2)),
                jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"],
            jax.random.PRNGKey(0))
        sp = jax.device_put(synthetic_params(sam_shapes))
        pipe = ProtoSAM(None, None, sam, sp,
                        ProtoSAMConfig(image_size=(1024, 1024), max_ccs=8,
                                       use_cca=False))
        outs = []
        for i in range(n_slices):
            args = (sp, jnp.asarray(qrys[i]), jnp.asarray(fields[i]))
            if strict:
                with jax.default_matmul_precision("highest"):
                    pred, _s, _ = pipe._jit_refine(*args)
            else:
                pred, _s, _ = pipe._jit_refine(*args)
            outs.append(np.asarray(pred.astype(jnp.float32)) > 0)
        masks[dt_name] = outs

    dices = [_dice(masks["bf16"][i], masks["f32"][i])
             for i in range(n_slices)]
    res = {"measurement": "refine stage, controlled multi-component logits "
                          "(2-4 gaussian components, contrast ~|6|, vit_b "
                          "1024 frame; f32 leg strict)",
           "components_per_slice": list(ks),
           "dice_bf16_vs_f32_per_slice": [round(d, 4) for d in dices],
           "min": round(min(dices), 4),
           "mean": round(sum(dices) / len(dices), 4)}
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--goldens" in args or not args:
        measure_goldens()
    if "--bench" in args or not args:
        measure_bench(int(os.environ.get("DRIFT_SLICES", "8")))
    if "--refine" in args:
        measure_refine(int(os.environ.get("DRIFT_REFINE_SLICES", "6")))
