#!/usr/bin/env python3
"""Micro-bench of DINOv2 packed-attention kernel VARIANTS at the production
shape ((8, 2432, 3*1024), nh=16, bf16) — isolates the kernel so each A/B
costs one ~30 s compile instead of a ~2 min encoder build.

Variants (all per-head math inside one program per batch element, as in
ops/attention._packed_kernel):
  v0   current serial kernel (scale+mask pass, max, exp, sum, PV)
  v1   v0 + softmax row-sum folded into the PV dot via a ones lane on v
       (N=hd+1 <= 128 stays one MXU N-tile: the sum is FREE)
  v2   v1 + scale folded into q and pad-mask folded into the score dot via
       an augmented K lane (K=hd+2 <= 128 stays one K-tile: mask is FREE)
  v3   v2 with bf16 scores (MXU emits bf16; max/sub/exp run on bf16) —
       approximate, bf16-path only candidate

Usage: python tools/microbench_attn.py [reps] [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, NH, HD = 8, 2432, 16, 64
N_VALID = 2305
C = NH * HD
SCALE = HD ** -0.5


def _v0_kernel(qkv_ref, out_ref, *, scale, n_valid, nh, hd):
    c = nh * hd

    def one_head(q, k, v):
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if n_valid is not None:
            cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols >= n_valid, -jnp.inf, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc / l).astype(out_ref.dtype)

    def body(j, carry):
        off = j * (2 * hd)
        qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
        kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
        vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
        o0 = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
        o1 = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])
        out_ref[0, :, pl.ds(off, 2 * hd)] = jnp.concatenate([o0, o1], axis=1)
        return carry

    lax.fori_loop(0, nh // 2, body, jnp.int32(0))


def _v1_kernel(qkv_ref, out_ref, va_ref, *, scale, n_valid, nh, hd):
    """Row-sum folded into PV: va = [v | 1] per head, acc_aug = p @ va."""
    c = nh * hd

    def one_head(q, k, v):
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if n_valid is not None:
            cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols >= n_valid, -jnp.inf, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        va_ref[:, :hd] = v
        va_ref[:, hd:hd + 1] = jnp.ones((v.shape[0], 1), va_ref.dtype)
        acc = lax.dot_general(
            p, va_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)

    def body(j, carry):
        off = j * (2 * hd)
        qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
        kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
        vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
        o0 = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
        o1 = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])
        out_ref[0, :, pl.ds(off, 2 * hd)] = jnp.concatenate([o0, o1], axis=1)
        return carry

    lax.fori_loop(0, nh // 2, body, jnp.int32(0))


def _v2_kernel(qkv_ref, out_ref, qa_ref, ka_ref, va_ref, *,
               scale, n_valid, nh, hd, score_dtype=jnp.float32):
    """v1 + scale-in-q + pad-mask as an augmented K lane:
    qa = [q*scale | 1], ka = [k | maskbias] with maskbias = -1e30 on pad
    rows — the score dot then yields masked, scaled scores directly
    (K=hd+1 <= 128: one K-tile, so the mask costs zero MXU time)."""
    c = nh * hd
    sdt = score_dtype

    def one_head(q, k, v):
        qa_ref[:, :hd] = (q.astype(jnp.float32) * scale).astype(qa_ref.dtype)
        qa_ref[:, hd:hd + 1] = jnp.ones((q.shape[0], 1), qa_ref.dtype)
        ka_ref[:, :hd] = k
        rows = lax.broadcasted_iota(jnp.int32, (k.shape[0], 1), 0)
        ka_ref[:, hd:hd + 1] = jnp.where(
            rows >= n_valid, jnp.asarray(-1e30, jnp.float32), 0.0
        ).astype(ka_ref.dtype) if n_valid is not None else jnp.zeros(
            (k.shape[0], 1), ka_ref.dtype)
        scores = lax.dot_general(
            qa_ref[...], ka_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=sdt)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        va_ref[:, :hd] = v
        va_ref[:, hd:hd + 1] = jnp.ones((v.shape[0], 1), va_ref.dtype)
        acc = lax.dot_general(
            p, va_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)

    def body(j, carry):
        off = j * (2 * hd)
        qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
        kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
        vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
        o0 = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
        o1 = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])
        out_ref[0, :, pl.ds(off, 2 * hd)] = jnp.concatenate([o0, o1], axis=1)
        return carry

    lax.fori_loop(0, nh // 2, body, jnp.int32(0))


def build(variant, dtype=jnp.bfloat16):
    kw = dict(scale=SCALE, n_valid=N_VALID, nh=NH, hd=HD)
    scratch = []
    if variant == "v0":
        kern = functools.partial(_v0_kernel, **kw)
    elif variant == "v1":
        kern = functools.partial(_v1_kernel, **kw)
        scratch = [pltpu.VMEM((S, HD + 1), dtype)]
    elif variant in ("v2", "v3"):
        sdt = jnp.bfloat16 if variant == "v3" else jnp.float32
        kern = functools.partial(_v2_kernel, **kw, score_dtype=sdt)
        scratch = [pltpu.VMEM((S, HD + 1), dtype),
                   pltpu.VMEM((S, HD + 1), dtype),
                   pltpu.VMEM((S, HD + 1), dtype)]
    else:
        raise SystemExit(f"unknown variant {variant}")

    def call(qkv):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, 3 * C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, C), qkv.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv)

    return call


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    variants = sys.argv[2:] or ["v0", "v1", "v2", "v3"]
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * C)) * 0.5, jnp.bfloat16)
    ref = None
    for variant in variants:
        call = build(variant)

        @jax.jit
        def prog(x):
            def body(i, acc):
                # defeat CSE across reps without promoting x's dtype
                out = call(x + (acc * 1e-8).astype(x.dtype))
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return lax.fori_loop(0, reps, body, jnp.float32(0))

        t0 = time.time(); float(prog(qkv)); comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time(); float(prog(qkv))
            best = min(best, time.time() - t0)
        per = (best - 0.05) / reps * 1000
        out = call(qkv)
        if ref is None:
            ref = np.asarray(out.astype(jnp.float32))[:, :N_VALID]
            err = 0.0
        else:
            got = np.asarray(out.astype(jnp.float32))[:, :N_VALID]
            err = float(np.max(np.abs(got - ref)))
        print(f"{variant}: {per:.2f} ms/call (compile {comp:.0f}s, "
              f"max|delta vs v0|={err:.2e})", flush=True)


if __name__ == "__main__":
    main()
