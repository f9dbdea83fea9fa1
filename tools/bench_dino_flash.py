#!/usr/bin/env python3
"""Sweep stock flash-attention block sizes at the DINOv2-L flagship shape
(batch 8, 16 heads, S=2560 padded, D=64) on the real chip.

Usage: python tools/bench_dino_flash.py [reps]
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
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    b, nh, s, d, n_valid = 8, 16, 2560, 64, 2305
    mk = lambda: jnp.asarray(rng.standard_normal((b, nh, s, d)) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    ids = jnp.broadcast_to((jnp.arange(s) < n_valid).astype(jnp.int32)[None],
                           (b, s))
    seg = SegmentIds(q=ids, kv=ids)
    flops = 2 * 2 * n_valid * n_valid * d * nh * b

    def run(bq, bk):
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                qq = jnp.roll(q, i, axis=0)
                out = flash_attention(qq, k, v, segment_ids=seg,
                                      sm_scale=d ** -0.5, block_sizes=bs)
                return acc + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        t0 = time.time()
        float(loop(q, k, v))
        comp = time.time() - t0
        t0 = time.time()
        float(loop(q, k, v))
        dt = (time.time() - t0 - 0.05) / reps * 1000
        print(f"bq={bq} bk={bk}: {dt:.2f} ms/layer-call "
              f"(compile {comp:.0f}s), {flops / (dt / 1e3) / 1e12:.1f} TF/s",
              flush=True)

    for bq, bk in [(512, 512), (1280, 512), (512, 1280), (1280, 1280),
                   (2560, 512), (256, 512), (512, 256)]:
        run(bq, bk)


if __name__ == "__main__":
    main()
