#!/usr/bin/env python3
"""Profile the fused volume program on the real chip with jax.profiler and
print a per-XLA-op time breakdown (the tool that hunts scheduling/fusion
anomalies the per-stage timers cannot see).

Usage:
    python tools/trace_volume.py [slice_batch] [sam_ver]
Writes the raw trace under /tmp/voltrace and prints the top ops by device
time.
"""

import glob
import gzip
import json
import os
import sys
import time
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_pipe(slice_batch, sam_ver, image_size=672):
    from protosam_tpu.models.alpnet import FewShotSeg
    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
    from protosam_tpu.utils.synthetic import synthetic_params

    quant = os.environ.get("TRACE_INT8", "1") == "1"  # adopted default path
    coarse = FewShotSeg(image_size=image_size, which_model="dinov2_l14",
                        dtype=jnp.bfloat16, quant_dense=quant)
    sam = build_sam(sam_ver, dtype=jnp.bfloat16, quant_dense=quant)
    rng = jax.random.PRNGKey(0)
    supp = jax.random.normal(rng, (1, 3, image_size, image_size), jnp.float32)
    fg = jnp.zeros((1, image_size, image_size))
    q3 = image_size // 3
    fg = fg.at[:, q3:2 * q3, q3:2 * q3].set(1.0)

    cp_shapes = jax.eval_shape(
        lambda r: coarse.init(r, supp, fg, 1 - fg, supp)["params"], rng)
    sp_shapes = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1, sam.image_size, sam.image_size, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                           jnp.zeros((1, 4)))["params"], rng)
    dev = jax.devices()[0]
    cp = jax.device_put(synthetic_params(cp_shapes), dev)
    sp = jax.device_put(synthetic_params(sp_shapes), dev)
    jax.block_until_ready((cp, sp))
    pipe = ProtoSAM(coarse, cp, sam, sp,
                    ProtoSAMConfig(image_size=(sam.image_size,) * 2, max_ccs=8))
    return pipe, (cp, sp, supp, fg)


def smooth_volume(key, n, image_size):
    from protosam_tpu.ops.resize import resize_bilinear

    low = jax.random.normal(key, (n, 3, 21, 21), jnp.float32)
    return resize_bilinear(low, (image_size, image_size)) * 3.0


def parse_trace(trace_dir):
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("NO TRACE FILES under", trace_dir)
        return
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # device pid: process named /device:TPU:*, thread 'XLA Ops'
    dev_pids = set()
    op_tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in str(e.get("args", {}).get("name", "")):
                dev_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            nm = str(e.get("args", {}).get("name", ""))
            if nm in ("XLA Ops", "XLA Modules"):
                op_tids[(e["pid"], e["tid"])] = nm
    agg = collections.Counter()
    count = collections.Counter()
    cat = collections.Counter()
    cat_bytes = collections.Counter()
    total_mod = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        kind = op_tids.get((e["pid"], e.get("tid")))
        if kind == "XLA Ops" and e["pid"] in dev_pids:
            agg[e["name"]] += e.get("dur", 0.0)
            count[e["name"]] += 1
            args = e.get("args", {})
            # while/cond wrapper events nest their body ops (double
            # counting); category totals only sum LEAF ops
            c = str(args.get("hlo_category", "?"))
            if not e["name"].startswith(("while", "cond")):
                cat[c] += e.get("dur", 0.0)
                cat_bytes[c] += int(args.get("bytes_accessed", 0) or 0)
        elif kind == "XLA Modules" and e["pid"] in dev_pids:
            total_mod += e.get("dur", 0.0)
    tot = sum(agg.values())
    print(f"\n== leaf-op time by hlo_category ==")
    for c, dur in cat.most_common(20):
        gbs = cat_bytes[c] / 1e9 / (dur / 1e6 + 1e-9)
        print(f"{dur/1e3:9.2f} ms  {gbs:7.0f} GB/s  {c}")
    print(f"\n== device op time: {tot/1e3:.1f} ms "
          f"(module track: {total_mod/1e3:.1f} ms) ==")
    for name, dur in agg.most_common(60):
        print(f"{dur/1e3:9.2f} ms  x{count[name]:<4d} {name[:110]}")


def main():
    slice_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sam_ver = sys.argv[2] if len(sys.argv) > 2 else "vit_b"
    image_size = 672
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/voltrace")

    print("devices:", jax.devices(), flush=True)
    pipe, (cp, sp, supp, fg) = build_pipe(slice_batch, sam_ver, image_size)
    supp_fts = pipe._jit_supp_fts(cp, supp)
    jax.block_until_ready(supp_fts)
    print("supp_fts done", flush=True)

    vols = [smooth_volume(jax.random.PRNGKey(7 + i), slice_batch, image_size)
            for i in range(3)]
    jax.block_until_ready(vols)

    def run(v):
        p, s = pipe._jit_volume(cp, sp, supp, fg, 1 - fg, v, supp_fts, 2)
        return float(p.astype(jnp.float32).sum()) + \
            float(s.astype(jnp.float32).sum())

    t0 = time.time()
    run(vols[0])  # compile + warm
    print(f"compile+first: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        run(vols[1])
        run(vols[2])
    wall = (time.time() - t0) / 2 * 1000
    print(f"timed (2 runs under trace): {wall:.1f} ms/batch-{slice_batch} "
          f"-> {slice_batch / (wall / 1000):.2f} slices/s", flush=True)
    parse_trace(trace_dir)


if __name__ == "__main__":
    main()
