#!/usr/bin/env python3
"""Standalone on-chip sweep of the fused MLP kernel at the vit_h layer
geometry (M=32768, C=1280, H=5120) across M-tile sizes, vs the XLA Dense
composition on the same 2-D operands.

Standalone microbenches drift run-to-run on this terminal (ROUND_NOTES) —
only compare numbers WITHIN one invocation.

Usage: python tools/bench_mlp_kernel.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from protosam_tpu.ops.mlp_pallas import mlp_fused

    m, c, h = 32768, 1280, 5120
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, c)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, h)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((h,)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((h, c)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.02, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((m, c)) * 0.5, jnp.bfloat16)

    def timed(fn, *args):
        @jax.jit
        def prog(*a):
            def body(i, acc):
                r = fn(jnp.roll(a[0], i, axis=0), *a[1:])
                return acc + r.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        t0 = time.time(); float(prog(*args)); comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time(); float(prog(*args))
            best = min(best, time.time() - t0)
        return (best - 0.05) / reps * 1000, comp

    def xla_mlp(x, w1, b1, w2, b2, res):
        g = jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=True)
        return res + (jnp.dot(g, w2) + b2)

    ms, comp = timed(xla_mlp, x, w1, b1, w2, b2, res)
    print(f"xla 2d dense composition: {ms:.2f} ms (compile {comp:.0f}s)",
          flush=True)
    for bm, hc in ((512, 1), (512, 4), (1024, 4), (2048, 4), (1024, 8),
                   (2048, 8), (4096, 8)):
        fn = (lambda bm_, hc_: lambda x_, *a: mlp_fused(
            x_, *a, block_m=bm_, h_chunks=hc_))(bm, hc)
        try:
            ms, comp = timed(fn, x, w1, b1, w2, b2, res)
            print(f"mlp_fused block_m={bm} h_chunks={hc}: {ms:.2f} ms "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"mlp_fused block_m={bm} h_chunks={hc}: "
                  f"FAILED {str(e)[-160:]}", flush=True)


if __name__ == "__main__":
    main()
