#!/usr/bin/env python3
"""Analytic single-chip roofline for the ProtoSAM pipeline configs.

Prints the FLOP budget per pipeline stage for a given (coarse, sam_ver,
image_size, slice_batch) config, the ideal ms at the chip's calibrated
matmul peak, and — given a measured wall time (``--measured-ms``) — the
end-to-end MXU efficiency and the absolute throughput ceiling.  This is
the artifact that locates the gap between a BENCH number and the >50
slices/sec/chip BASELINE target: for dinov2_l14 + vit_b at 672 px the
ceiling at the v5e's calibrated 126 TF/s is ~44 slices/sec, i.e. the
BASELINE target is only reachable with >1 chip (parallel/sharding.py) or
a lower-precision mode.

The FLOP model counts dense gemms + attention exactly as the production
kernels execute them (augmented-operand score contractions count their
real K = D+H+W lanes; DINOv2 sequences count the 128-multiple pad the
kernels require, ops/attention.py).  Bandwidth-bound stages (CCA,
resizes, prompt extraction) carry measured per-op costs from the r2
device traces (ROUND_NOTES.md) — they are small and near-constant across
configs.

Usage:
    python tools/roofline.py                      # vit_b flagship table
    python tools/roofline.py --sam vit_h
    python tools/roofline.py --sam vit_b --measured-ms 367
"""

from __future__ import annotations

import argparse

# calibrated bf16 matmul peak of the tunnel v5e.  The r1 calibration
# (large square bf16 matmuls via tools/tpu_suite.py) read 126 TF/s, but
# the r2 session-4 device traces show the production encoders' dense
# mega-fusions sustaining 190-200 TF/s on clean shapes (ROUND_NOTES.md:
# the fc1+GELU+fc2+LayerScale+residual fusion at ~peak) — the r1 probe
# was itself bandwidth-limited.  Use the in-trace sustained figure; the
# ceilings below are what the hardware demonstrably delivers.
PEAK_TFS = 190.0

SAM_CFG = {
    # embed, depth, heads, n_global
    "vit_b": (768, 12, 12, 4),
    "vit_l": (1024, 24, 16, 4),
    "vit_h": (1280, 32, 16, 4),
}

DINO_CFG = {
    # embed, depth, heads, mlp_ratio
    "dinov2_l14": (1024, 24, 16, 4),
    "dinov2_b14": (768, 12, 12, 4),
    "dinov2_t14": (192, 12, 3, 4),
}

# measured bandwidth-bound stage costs, ms per slice, from the r2 device
# traces at 672 px / 1024 SAM frame (ROUND_NOTES.md): CCA scratch kernel
# 3.28 ms/mask on mixed 1024^2 masks, extract/decode/format tails
MEASURED_MS_PER_SLICE = {
    "cca + prompt extract": 3.8,
    "decode + postprocess": 1.2,
}

# DEMONSTRATED stage costs, ms per batch-8 (r3 device measurements) — the
# flop ceiling above assumes perfect 128-lane MXU packing and zero VPU
# time; this table is what the best kernels built so far actually achieve
# on this chip, i.e. an evidence-backed achievable ceiling.  Sources:
# ROUND_NOTES.md r3 (encoder benches + volume traces).
DEMONSTRATED_MS_B8 = {
    "dinov2_l14 encoder": 116.0,     # aug-kernel attention, r3
    "vit_b sam encoder": 106.9,      # sum-folded window/global, r3
    "cca + prompts + decode tail": 28.0,  # r3 batch-8 volume trace
}

# Same table for the vit_h flagship refine model.  The r3 "vit_h add_add
# elementwise collapse" lead is CLOSED as an arithmetic artifact (r4): the
# quoted "1.09 ms flop floor" for the c=1280 fc2 divided its 430 GFLOP by
# the ~394 TF/s INT8 peak; at the bf16 peak (190) the floor is 2.26 ms and
# the in-trace 2.23 was already AT it.  r4 marginal-cost measurements
# (ROUND_NOTES) confirm: each MLP dot standalone = 2.32-2.36 ms = 184 TF/s
# = ~97% of calibrated peak, GELU fully overlapped (identity-act A/B
# equal), and every lowering route (2-D/3-D/4-D/Pallas) within noise.
# The encoder's remaining demonstrated-vs-flop gap is attention-packing
# physics (window kernel 4.8 ms/layer vs ~2.7 cycle floor, aug-K global),
# the same class as vit_b's.
DEMONSTRATED_MS_B8_VITH = {
    "dinov2_l14 encoder": 116.0,
    "vit_h sam encoder": 485.5,      # r4 best (scoped-vmem 49152)
    "cca + prompts + decode tail": 28.0,
}

# The ADOPTED int8 W8A8 path (r5; ops/quant, DRIFT_r05 >= 0.9955 vs
# f32-strict).  Stage costs from the r5 batch-24 int8 device trace
# (TRACE_B24_INT8_r05.log leaf-op sums / 3): the dense stages ride the
# int8 MXU at ~1.6x the bf16 rate (tools/microbench_int8: 325.8 vs
# 201.5 TF/s), attention kernels stay bf16, and the CCA tail dropped to
# ~5 ms/b8 with the convergence exit (probe: anatomy masks converge in
# 3-5 of the 64 max iterations).
DEMONSTRATED_MS_B8_INT8 = {
    "dinov2_l14 encoder (int8 dense)": 113.3,
    "vit_b sam encoder (int8 dense)": 107.3,
    "cca + prompts + decode tail": 18.0,
}


def demonstrated_ceiling(table=None) -> float:
    """slices/sec/chip if every stage ran at its best demonstrated cost."""
    if table is None:  # `or` would silently remap an explicit empty dict
        table = DEMONSTRATED_MS_B8
    return 8.0 / sum(table.values()) * 1e3


def _pad128(n: int) -> int:
    return (n + 127) // 128 * 128


def dino_flops(name: str, image_size: int) -> dict[str, float]:
    c, depth, heads, mlp = DINO_CFG[name]
    hd = c // heads
    grid = image_size // 14
    s = _pad128(grid * grid + 1)   # cls token, kernel 128-pad (ops/attention.py)
    dense = 2 * s * (3 * c * c + c * c + 2 * mlp * c * c) * depth
    attn = 2 * 2 * s * s * hd * heads * depth   # QK^T + PV, all heads
    patch = 2 * grid * grid * (14 * 14 * 3) * c
    return {"dinov2 dense gemms": dense + patch, "dinov2 attention": attn}


def sam_flops(ver: str, image_size: int = 1024, win: int = 14) -> dict[str, float]:
    c, depth, heads, n_global = SAM_CFG[ver]
    hd = c // heads
    g = image_size // 16                       # 64 at 1024
    s = g * g
    dense = 2 * s * (3 * c * c + c * c + 2 * 4 * c * c) * depth
    patch = 2 * s * (16 * 16 * 3) * c
    neck = 2 * s * c * 256 + 2 * s * 256 * 256 * 9
    # global layers: augmented contraction K = hd + H + W (ops/vitdet_flash.py)
    k_aug = hd + 2 * g
    glob = (2 * s * s * k_aug + 2 * s * s * hd) * heads * n_global
    # windowed layers: ceil(g/win)^2 windows of win^2 tokens, K = hd + 2*win
    nw = (-(-g // win)) ** 2
    sw = win * win
    k_aug_w = hd + 2 * win
    wind = ((2 * sw * sw * k_aug_w + 2 * sw * sw * hd) * heads * nw
            * (depth - n_global))
    # decode stage: prompt encoder + 2-layer TwoWayTransformer + upscale,
    # ~4 GF/slice at K=1 components — counted as dense
    decode = 4e9
    return {"sam dense gemms": dense + patch + neck + decode,
            "sam global attn (aug)": glob,
            "sam window attn (aug)": wind}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse", default="dinov2_l14")
    ap.add_argument("--sam", default="vit_b")
    ap.add_argument("--image-size", type=int, default=672)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured wall ms for one slice batch")
    args = ap.parse_args()

    parts: dict[str, float] = {}
    parts.update(dino_flops(args.coarse, args.image_size))
    parts.update(sam_flops(args.sam))

    b = args.batch
    total_tf = 0.0
    ideal_ms = 0.0
    print(f"config: {args.coarse} + {args.sam} @ {args.image_size} px, "
          f"slice batch {b}, calibrated peak {PEAK_TFS} TF/s")
    print(f"{'stage':<28}{'TFLOP/batch':>14}{'ideal ms':>10}")
    for name, f in parts.items():
        tf = f * b / 1e12
        ms = tf / PEAK_TFS * 1e3
        total_tf += tf
        ideal_ms += ms
        print(f"{name:<28}{tf:>14.2f}{ms:>10.1f}")
    bw_ms = sum(MEASURED_MS_PER_SLICE.values()) * b
    for name, per_slice in MEASURED_MS_PER_SLICE.items():
        print(f"{name:<28}{'(bandwidth)':>14}{per_slice * b:>10.1f}")
    ideal_ms += bw_ms
    print(f"{'TOTAL':<28}{total_tf:>14.2f}{ideal_ms:>10.1f}")
    ceiling = b / ideal_ms * 1e3
    print(f"\nthroughput ceiling at calibrated peak: "
          f"{ceiling:.1f} slices/sec/chip")
    table = {"vit_b": DEMONSTRATED_MS_B8,
             "vit_h": DEMONSTRATED_MS_B8_VITH}.get(args.sam)
    if args.coarse == "dinov2_l14" and table is not None:
        dem = demonstrated_ceiling(table)
        print(f"demonstrated-stage ceiling (best measured kernels): "
              f"{dem:.1f} slices/sec/chip")
        for name, ms in table.items():
            print(f"  {name:<28}{ms:>8.1f} ms/batch-8")
    if args.measured_ms:
        eff = ideal_ms / args.measured_ms * 100
        print(f"measured {args.measured_ms:.0f} ms/batch -> "
              f"{b / args.measured_ms * 1e3:.2f} slices/sec "
              f"({eff:.0f}% of the analytic ceiling)")


if __name__ == "__main__":
    main()
