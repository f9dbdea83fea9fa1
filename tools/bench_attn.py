#!/usr/bin/env python3
"""On-chip microbench of the ViTDet attention kernels (global + windowed).

Times K repetitions inside one jitted program (inputs varied with jnp.roll
to defeat the terminal's execution cache) and checks numerics vs the
chunked XLA reference.  Usage: python tools/bench_attn.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=8, flops=None):
    """fn(*args) -> scalar; jitted K-rep loop, one dispatch."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            rolled = [jnp.roll(x, i, axis=0) for x in a]
            return acc + fn(*rolled)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    t0 = time.time()
    float(loop(*args))  # compile+first
    comp = time.time() - t0
    t0 = time.time()
    float(loop(*args))
    dt = (time.time() - t0 - 0.05) / reps * 1000  # subtract ~1 RT
    eff = f", {flops / (dt / 1e3) / 1e12:.1f} TF/s" if flops else ""
    print(f"{name}: {dt:.2f} ms/call (compile {comp:.0f}s){eff}", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from protosam_tpu.ops.vitdet_flash import (
        flash_attention_relpos,
        window_flash_attention,
    )
    from protosam_tpu.models.sam.image_encoder import _rel_pos_table, _attend

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- global: SAM-B config, batch 8 --------------------------------
    b, h, w, nh, d = 8, 64, 64, 12, 64
    s = h * w
    scale = d ** -0.5
    mk = lambda: jnp.asarray(rng.standard_normal((b, s, nh, d)) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    Rh = jnp.asarray(rng.standard_normal((h, h, d)) * 0.05, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((w, w, d)) * 0.05, jnp.float32)
    attn_flops = 2 * 2 * s * s * d * nh * b

    # numerics vs einsum reference on a SMALL config (the full-shape f32
    # reference would materialize (8,12,4096,4096) = 6.4 GB and OOM)
    qs_, ks_, vs_ = q[:1, :, :2], k[:1, :, :2], v[:1, :, :2]
    ref = _attend(qs_.reshape(1, h, w, 2, d).astype(jnp.float32),
                  ks_.astype(jnp.float32), vs_.astype(jnp.float32),
                  Rh, Rw, 2, scale, (h, w), True, jnp.float32)
    ref = np.asarray(ref)
    for r in (2, 4, 8):
        got = np.asarray(flash_attention_relpos(
            qs_, ks_, vs_, Rh, Rw, (h, w), scale, rows_per_blk=r,
            interpret=False).astype(jnp.float32))
        err = float(np.max(np.abs(got - ref.reshape(1, s, 2, d))))
        print(f"global r={r}: maxerr={err:.4f}", flush=True)
        timed(f"global flash r={r}",
              lambda q, k, v: flash_attention_relpos(
                  q, k, v, Rh, Rw, (h, w), scale, rows_per_blk=r,
                  interpret=False).astype(jnp.float32).sum(),
              q, k, v, reps=reps, flops=attn_flops)

    # ---- windowed: SAM-B config, batch 8 -> 200 windows ----------------
    win, nwnd = 14, 200
    sw = win * win
    mkw = lambda: jnp.asarray(rng.standard_normal((nwnd, sw, nh, d)) * 0.3,
                              jnp.bfloat16)
    qw, kw, vw = mkw(), mkw(), mkw()
    Rhw = jnp.asarray(rng.standard_normal((win, win, d)) * 0.05, jnp.float32)
    Rww = jnp.asarray(rng.standard_normal((win, win, d)) * 0.05, jnp.float32)

    refw = _attend(qw.reshape(nwnd, win, win, nh, d).astype(jnp.float32),
                   kw.astype(jnp.float32), vw.astype(jnp.float32),
                   Rhw, Rww, nh, scale, (win, win), True, jnp.float32)
    gotw = window_flash_attention(qw, kw, vw, Rhw, Rww, win, scale,
                                  interpret=False)
    err = float(jnp.max(jnp.abs(gotw.astype(jnp.float32) -
                                refw.reshape(nwnd, sw, nh, d))))
    print(f"window: maxerr={err:.4f}", flush=True)
    wflops = 2 * 2 * sw * sw * d * nh * nwnd
    timed("window flash (heads-loop)",
          lambda q, k, v: window_flash_attention(
              q, k, v, Rhw, Rww, win, scale,
              interpret=False).astype(jnp.float32).sum(),
          qw, kw, vw, reps=reps, flops=wflops)
    from protosam_tpu.ops.vitdet_flash import window_attention_xla_aug

    gotx = window_attention_xla_aug(qw, kw, vw, Rhw, Rww, win, scale)
    err = float(jnp.max(jnp.abs(gotx.astype(jnp.float32) -
                                refw.reshape(nwnd, sw, nh, d))))
    print(f"window xla-aug: maxerr={err:.4f}", flush=True)
    timed("window XLA-aug (no pallas)",
          lambda q, k, v: window_attention_xla_aug(
              q, k, v, Rhw, Rww, win, scale).astype(jnp.float32).sum(),
          qw, kw, vw, reps=reps, flops=wflops)
    for wpp in (2, 4):
        timed(f"window flash wpp={wpp}",
              lambda q, k, v: window_flash_attention(
                  q, k, v, Rhw, Rww, win, scale, interpret=False,
                  wpp=wpp).astype(jnp.float32).sum(),
              qw, kw, vw, reps=reps, flops=wflops)
    timed("window chunked-XLA (old path)",
          lambda q, k, v: _attend(
              q.reshape(nwnd, win, win, nh, d), k, v, Rhw, Rww, nh, scale,
              (win, win), True, jnp.bfloat16).astype(jnp.float32).sum(),
          qw, kw, vw, reps=reps, flops=wflops)


if __name__ == "__main__":
    main()
