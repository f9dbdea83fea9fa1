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
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, reps=8, inner=4):
    @jax.jit
    def prog(*a):
        def body(i, acc):
            r = fn(*[jnp.roll(x, i, axis=0) if x.ndim > 1 else x
                     for x in a])
            return acc + r.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    float(prog(*args))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(prog(*args))
        best = min(best, time.time() - t0)
    return (best - 0.004) / inner * 1000


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
