#!/usr/bin/env python3
"""On-chip bench of the DINOv2 encoder alone (the coarse-stage cost center).

Reproduces the in-pipeline context of the masked flash kernel (nn.scan over
24 layers, bf16, synthetic params as jit arguments) without the rest of the
volume program, so kernel/layout experiments iterate in ~3 min compiles
instead of ~10.  Usage: python tools/bench_dino_encoder.py [reps] [blk_q]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    blk_q = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if blk_q:
        import protosam_tpu.ops.attention as att
        orig = att.masked_flash_attention
        att.masked_flash_attention = (
            lambda *a, **k: orig(*a, **{**k, "blk_q": blk_q}))

    from protosam_tpu.models.dinov2 import DinoVisionTransformer
    from protosam_tpu.utils.synthetic import synthetic_params

    model = DinoVisionTransformer(patch_size=14, embed_dim=1024, depth=24,
                                  num_heads=16, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 672, 672, 3)) * 0.5, jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, x)["params"], jax.random.PRNGKey(0))
    params = jax.device_put(synthetic_params(shapes), jax.devices()[0])
    jax.block_until_ready(params)
    print("params ready", flush=True)

    @jax.jit
    def prog(p, x):
        def body(i, acc):
            out = model.apply({"params": p}, jnp.roll(x, i, axis=0))
            return acc + out["x_norm_patchtokens"].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    t0 = time.time(); float(prog(params, x)); comp = time.time() - t0
    best = 1e9
    for r in range(3):
        xr = jnp.roll(x, r + 1, axis=1)
        t0 = time.time(); float(prog(params, xr))
        best = min(best, time.time() - t0)
    per = (best - 0.05) / reps * 1000
    print(f"dino encoder batch-8: {per:.1f} ms/call "
          f"({per / 24:.2f} ms/layer-equiv; compile {comp:.0f}s, "
          f"blk_q={blk_q or 'auto'})", flush=True)

    if os.environ.get("TRACE"):
        with jax.profiler.trace("/tmp/dinotrace"):
            float(prog(params, jnp.roll(x, 9, axis=1)))
        from tools.trace_volume import parse_trace
        parse_trace("/tmp/dinotrace")


if __name__ == "__main__":
    main()
