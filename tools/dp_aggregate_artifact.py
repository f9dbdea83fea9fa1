#!/usr/bin/env python3
"""Back the ">50 slices/sec is a >=2-chip figure" claim with an EXECUTED /
COMPILED program artifact instead of prose (VERDICT r2 #10).

Three parts, all on the 8-virtual-device CPU mesh
(xla_force_host_platform_device_count):

1. COMPILE the dp volume program at the FULL bench geometry (DINOv2-L/14 +
   SAM vit_b, 672px, 24 slices -> 3 per chip) from abstract operands and
   assert the optimized HLO contains ZERO cross-chip collectives — the
   per-chip program is the single-chip bench program, so per-chip
   throughput is preserved under data-parallel scaling by construction.
2. EXECUTE the same shard_map path at tiny geometry and assert bit-equal
   outputs vs single-device (the semantic half of the scaling claim).
3. Combine with the measured single-chip slices/sec (BENCH json) into the
   aggregate figure.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/dp_aggregate_artifact.py [--bench-json BENCH_r0X.json] \
      [--out DP_AGGREGATE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-json", default=None,
                    help="bench.py output to take the single-chip "
                         "slices/sec from")
    ap.add_argument("--out", default="DP_AGGREGATE.json")
    ap.add_argument("--slices", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")

    from protosam_tpu.models.alpnet import FewShotSeg
    from protosam_tpu.models.io_protocol import ALPNetInput
    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.parallel import make_mesh
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig

    devs = jax.devices()
    assert len(devs) == 8, f"need 8 virtual devices, got {devs}"
    mesh = make_mesh(n_data=8, n_model=1)
    result = {"mesh": {"data": 8, "model": 1}, "backend": "cpu-virtual"}

    # ---- part 1: full-geometry compile, zero collectives ------------------
    image_size, n = 672, args.slices
    coarse = FewShotSeg(image_size=image_size, which_model="dinov2_l14",
                        dtype=jnp.bfloat16)
    sam = build_sam("vit_b", dtype=jnp.bfloat16, image_size=1024)
    rng = jax.random.PRNGKey(0)
    supp = jnp.zeros((1, 3, image_size, image_size))
    fg = jnp.zeros((1, image_size, image_size)).at[:, 224:448, 224:448].set(1.)
    pipe_cfg = ProtoSAMConfig(image_size=(1024, 1024), max_ccs=8)

    cp_shapes = jax.eval_shape(
        lambda r: coarse.init(r, supp, fg, 1 - fg, supp)["params"], rng)
    sp_shapes = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                           jnp.zeros((1, 4)))["params"], rng)
    pipe = ProtoSAM(coarse, None, sam, None, pipe_cfg)
    supp_fts_shapes = jax.eval_shape(
        lambda p, s: coarse.apply({"params": p}, s,
                                  method=coarse.get_features),
        cp_shapes, supp)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    sds = lambda a, sh: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), a)
    abstract = (
        sds(cp_shapes, repl), sds(sp_shapes, repl),
        jax.ShapeDtypeStruct(supp.shape, supp.dtype, sharding=repl),
        jax.ShapeDtypeStruct(fg.shape, fg.dtype, sharding=repl),
        jax.ShapeDtypeStruct(fg.shape, fg.dtype, sharding=repl),
        jax.ShapeDtypeStruct((n, 3, image_size, image_size), jnp.float32,
                             sharding=shard),
        sds(supp_fts_shapes, repl),
    )
    t0 = time.time()
    compiled = pipe._jit_volume_dp(mesh).lower(*abstract, 2).compile()
    hlo = compiled.as_text()
    found = {c: hlo.count(c) for c in COLLECTIVES if c in hlo}
    result["full_geometry_compile"] = {
        "config": "dinov2_l14 + vit_b, 672px, 24 slices over 8 chips "
                  "(3/chip, slice_batch 2)",
        "compile_s": round(time.time() - t0, 1),
        "collectives_in_optimized_hlo": found,
        "zero_collectives": not found,
        "hlo_bytes": len(hlo),
    }
    assert not found, f"dp program contains collectives: {found}"
    comp_s = result["full_geometry_compile"]["compile_s"]
    print(f"full-geometry dp compile OK ({comp_s}s, zero collectives)",
          flush=True)

    # ---- part 2: tiny-geometry EXECUTION, bit-equal to single device ------
    import numpy as np

    coarse_t = FewShotSeg(image_size=126, which_model="dinov2_t14")
    sam_t = build_sam("vit_t", image_size=256)
    supp_t = jax.random.normal(rng, (1, 3, 126, 126))
    fg_t = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    queries = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 126, 126))
    cp = coarse_t.init(rng, supp_t, fg_t, 1 - fg_t, supp_t)["params"]
    sp = sam_t.init(rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
                    jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    pipe_t = ProtoSAM(coarse_t, cp, sam_t, sp,
                      ProtoSAMConfig(image_size=(256, 256), max_ccs=4))
    inp = ALPNetInput(supp_t, fg_t, queries[:1])
    single, _ = pipe_t.forward_volume(queries, inp, slice_batch=8)
    sharded, _ = pipe_t.forward_volume_sharded(queries, inp, mesh)
    equal = bool(np.array_equal(np.asarray(single), np.asarray(sharded)))
    result["tiny_geometry_execution"] = {
        "slices": 8, "bit_equal_to_single_device": equal}
    assert equal
    print("tiny-geometry dp execution bit-equal to single device", flush=True)

    # ---- part 3: the aggregate figure --------------------------------------
    if args.bench_json and os.path.exists(args.bench_json):
        with open(args.bench_json) as f:
            bench = json.loads(f.read().strip().splitlines()[-1])
        per_chip = bench["value"]
        result["aggregate"] = {
            "single_chip_slices_per_sec": per_chip,
            "chips_for_50": -(-50 // per_chip),
            "eight_chip_projection": round(per_chip * 8, 1),
            "basis": "zero-collective shard_map dp (parts 1+2): per-chip "
                     "program identical to the bench program",
        }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
