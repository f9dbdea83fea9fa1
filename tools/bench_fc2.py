#!/usr/bin/env python3
"""Probe the vit_h fc2 (+residual) slack: XLA flag sweep + Pallas GEMM A/B.

r3 HLO forensics located the vit_h encoder's biggest per-op slack in the
fc2 matmuls (5120->1280, fused with their residual adds).  The scoped-VMEM
bump took the conv emitter's K window 64->128 but the fusion still runs
~2x off the MXU roofline (EmitAllBatchInSublanes).  This tool isolates
that exact op at batch-8 geometry (tokens = 8*70*70 = 39200) and measures

  1. the XLA dense+bias+residual baseline,
  2. the same under candidate xla_tpu_* compiler options (forwarded
     per-compile; unknown flags are reported and skipped),
  3. a Pallas blocked GEMM with the bias+residual epilogue in-kernel.

Usage: python tools/bench_fc2.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 39200, 5120, 1280  # vit_h fc2 at batch 8, 70x70 padded tokens
FLOPS = 2 * M * K * N


def bench(call, args, reps, label):
    try:
        t0 = time.time()
        float(call(*args))
        comp = time.time() - t0
    except Exception as e:
        print(f"{label:44s}: COMPILE FAIL {str(e)[:120]}", flush=True)
        return None
    best = 1e9
    for r in range(3):
        a2 = [jnp.roll(a, r + 1, axis=0) if a.ndim > 1 else a for a in args]
        t0 = time.time()
        float(call(*a2))
        best = min(best, time.time() - t0)
    ms = (best - 0.03) / reps * 1000
    print(f"{label:44s}: {ms:7.2f} ms  {FLOPS / ms / 1e9:6.1f} TF/s",
          flush=True)
    return ms


def fc2_residual(x, w, b, r):
    """The encoder's exact composition: Dense(5120->1280) + residual."""
    def body(i, acc):
        y = jax.lax.dot_general(
            jnp.roll(x, i, axis=0), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        return acc + ((y + b) + r).astype(jnp.float32).sum()
    return body


def make_xla_prog(reps):
    def prog(x, w, b, r):
        return jax.lax.fori_loop(0, reps, fc2_residual(x, w, b, r),
                                 jnp.float32(0))
    return prog


# ---- Pallas blocked GEMM with residual epilogue -------------------------

def _gemm_kernel(x_ref, w_ref, b_ref, r_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = (acc_ref[...] + b_ref[...].astype(jnp.float32)
                      + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def pallas_fc2(x, w, b, r, bm=512, bk=1280, bn=1280, interpret=False):
    m, kdim = x.shape
    n = w.shape[1]
    nk = kdim // bk
    grid = (m // bm, n // bn, nk)
    return pl.pallas_call(
        lambda xr, wr, br, rr, orf, acc: _gemm_kernel(
            xr, wr, br, rr, orf, acc, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b, r)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    # pad M to a block multiple for the pallas variant; XLA sees true M
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((1, N)) * 0.01, jnp.bfloat16)
    r = jnp.asarray(rng.standard_normal((M, N)) * 0.1, jnp.bfloat16)

    prog = make_xla_prog(reps)
    base_args = (x, w, b, r)
    jitted = jax.jit(prog)
    print(f"fc2 geometry M={M} K={K} N={N}  ideal @190TF/s = "
          f"{FLOPS / 190e12 * 1e3:.2f} ms", flush=True)
    bench(jitted, base_args, reps, "xla dense+bias+residual (default opts)")

    candidates = [
        {"xla_tpu_scoped_vmem_limit_kib": "49152"},
        {"xla_tpu_scoped_vmem_limit_kib": "98304"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_enable_dot_strength_reduction": "false"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_dot_dot_fusion_duplicated": "true"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_rwb_fusion": "false"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_memory_limit_slop_factor": "90"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_licm_size_inflation_ratio": "2"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_use_repeated_instance_for_preferred_prefetch_time":
             "true"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_vector_load_fusion_window": "2048"},
        {"xla_tpu_scoped_vmem_limit_kib": "49152",
         "xla_tpu_vector_store_fusion_window": "512"},
    ]
    for opts in candidates:
        label = ",".join(f"{k.replace('xla_tpu_', '')}={v}"
                         for k, v in opts.items())
        try:
            call = jitted.lower(*base_args).compile(compiler_options=opts)
        except Exception as e:
            print(f"{label[:44]:44s}: REJECTED {str(e)[:90]}", flush=True)
            continue
        bench(call, base_args, reps, label[:44])

    # pallas GEMM: pad M 39200 -> 39424 (512*77); amortized into the block
    mp = ((M + 511) // 512) * 512
    xp = jnp.pad(x, ((0, mp - M), (0, 0)))
    rp = jnp.pad(r, ((0, mp - M), (0, 0)))

    def prog_pl(x, w, b, r):
        def body(i, acc):
            y = pallas_fc2(jnp.roll(x, i, axis=0), w, b, r)
            return acc + y.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    bench(jax.jit(prog_pl), (xp, w, b, rp), reps, "pallas blocked gemm+epilogue")


if __name__ == "__main__":
    main()
