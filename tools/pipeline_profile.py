#!/usr/bin/env python3
"""Per-stage timing of the flagship volume program at the bench config.

Times each jitted sub-stage of ProtoSAM._jit_volume separately (honest
scalar-read barriers, inputs pre-materialized), then the fused program —
shows where a slice's latency budget goes.  Usage:
    python tools/pipeline_profile.py [slice_batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, f, args_list, warm_args):
    """warm_args must be DISJOINT from every timed arg set: the axon
    terminal caches identical executions, so replaying a warm-up input
    in the timed loop measures a cached no-op."""
    t0 = time.time()
    jax.block_until_ready(f(*warm_args))
    print(f"{name} compile+first: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    out = None
    for a in args_list:
        out = f(*a)
        # force a full host read of one scalar depending on every output
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        float(s)
    dt = (time.time() - t0) / len(args_list) * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


def main():
    slice_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    image_size = 672

    from protosam_tpu.models.alpnet import FewShotSeg
    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig

    coarse = FewShotSeg(image_size=image_size, which_model="dinov2_l14",
                        dtype=jnp.bfloat16)
    sam = build_sam("vit_b", dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    supp = jax.random.normal(rng, (1, 3, image_size, image_size), jnp.float32)
    fg = jnp.zeros((1, image_size, image_size))
    q3 = image_size // 3
    fg = fg.at[:, q3:2 * q3, q3:2 * q3].set(1.0)

    # params via eval_shape + host-side random fill: no init forward pass
    # (a CPU-backend f32 DINOv2-L forward takes tens of minutes)
    from protosam_tpu.utils.synthetic import synthetic_params as materialize

    print("eval_shape...", flush=True)
    cp_shapes = jax.eval_shape(
        lambda r: coarse.init(r, supp, fg, 1 - fg, supp)["params"], rng)
    sp_shapes = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                           jnp.zeros((1, 4)))["params"], rng)
    print("materialize + device_put...", flush=True)
    dev = jax.devices()[0]
    cp = jax.device_put(materialize(cp_shapes), dev)
    sp = jax.device_put(materialize(sp_shapes), dev)
    jax.block_until_ready((cp, sp))
    print("params on device", flush=True)
    pipe = ProtoSAM(coarse, cp, sam, sp,
                    ProtoSAMConfig(image_size=(1024, 1024), max_ccs=8))

    def qry_batch(i):
        return jax.device_put(jax.random.normal(
            jax.random.PRNGKey(10 + i),
            (slice_batch, 3, image_size, image_size), jnp.float32))

    # index 0 is the warm-up input for every stage; 1..3 are timed.  The
    # sets must stay disjoint — the axon terminal caches identical
    # executions, so a replayed warm-up input times a cached no-op.
    qs = [(qry_batch(i),) for i in range(4)]
    print("encode support features...", flush=True)
    supp_fts = pipe._jit_supp_fts(cp, supp)
    jax.block_until_ready(supp_fts)
    print("supp_fts done", flush=True)

    # stage 1: coarse logits (dino on batch + ALP + upsample).
    # NOTE: params/supp_fts must be jit ARGUMENTS — closing over an 800 MB
    # param tree embeds it as HLO constants and the compile never finishes.
    coarse_jit = jax.jit(lambda p, sf, q: pipe.coarse_model.apply(
        {"params": p}, supp, fg, 1 - fg, q, True, 2, supp_fts=sf)["logits"])
    coarse_fn = lambda q: coarse_jit(cp, supp_fts, q)
    logits = timeit(f"coarse logits b{slice_batch}", coarse_fn, qs[1:], qs[0])

    # stage 2: prompt extraction (resize 1024 + CCA + points + preprocess)
    ex_fn = jax.jit(lambda q, lg: jax.vmap(pipe._extract_prompts)(
        q[:, None], lg[:, None]))
    exs = [(q[0], coarse_fn(q[0])) for q in qs]
    for e in exs:
        jax.block_until_ready(e)
    ex = timeit(f"extract prompts b{slice_batch}", ex_fn, exs[1:], exs[0])

    # stage 3: SAM encode
    enc_jit = jax.jit(lambda p, im: pipe.sam_model.apply(
        {"params": p}, im, method=pipe.sam_model.encode_image))
    enc_fn = lambda im: enc_jit(sp, im)
    ims = [(ex_fn(*e)["sam_image"],) for e in exs]
    for im in ims:
        jax.block_until_ready(im)
    emb = timeit(f"sam encode b{slice_batch}", enc_fn, ims[1:], ims[0])

    # stage 4: decode + postprocess
    dec_jit = jax.jit(lambda p, emb, ex: pipe._decode_stage(
        p, emb, ex["coords"], ex["labels"], ex["boxes"], ex["valid"],
        ex["pred"], (image_size, image_size),
        mask_inputs=ex.get("mask_inputs")))
    dec_fn = lambda emb, ex: dec_jit(sp, emb, ex)
    dec_args = []
    for e, im in zip(exs, ims):
        x = ex_fn(*e)
        dec_args.append((enc_fn(*im), x))
    for d in dec_args:
        jax.block_until_ready(d)
    timeit(f"decode+post b{slice_batch}", dec_fn, dec_args[1:], dec_args[0])

    # fused volume program
    vol_args = [(cp, sp, supp, fg, 1 - fg, q[0], supp_fts, 2) for q in qs]
    timeit(f"fused volume b{slice_batch}",
           lambda *a: pipe._jit_volume(*a[:7], val_wsize=a[7]), vol_args[1:],
           vol_args[0])


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
