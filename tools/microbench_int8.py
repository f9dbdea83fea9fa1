#!/usr/bin/env python3
"""Is the v5e int8 MXU path (2x bf16 peak) reachable from JAX dots?

Times the vit_h MLP GEMM geometry (M=32768, K=1280, N=5120) as:
  bf16 @ bf16 -> f32   (production today)
  int8 @ int8 -> int32 (W8A8 candidate)
  int8 dot + rank-1 dequant fused epilogue (realistic W8A8 layer)

Prints ms/call and effective TF/s for each.  Decides whether an opt-in
int8 encoder path is worth building (reference has no analog; this is a
TPU-native option gated on measured mask drift).
"""

import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args):
    # marginal-cost harness (r4): the old fixed-offset form produced a
    # negative time on a cheap op; reps-8-vs-32 cancels dispatch exactly
    from tools.marginal_bench import marginal_ms

    return marginal_ms(fn, *args)


def main():
    M, K, N = 32768, 1280, 5120
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    sx = jnp.asarray(rng.random((M, 1)), jnp.float32)
    sw = jnp.asarray(rng.random((1, N)), jnp.float32)

    flops = 2 * M * K * N

    def dot_bf16(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot_i8(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def dot_i8_dequant(x, w, a, b):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * a * b).astype(jnp.bfloat16)

    for name, fn, args in [
        ("bf16", dot_bf16, (xb, wb)),
        ("int8->int32", dot_i8, (xi, wi)),
        ("int8+dequant", dot_i8_dequant, (xi, wi, sx, sw)),
    ]:
        ms = bench(fn, args)
        print(f"{name:14s}: {ms:7.3f} ms  {flops / ms / 1e9:7.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
