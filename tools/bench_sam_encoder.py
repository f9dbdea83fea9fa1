#!/usr/bin/env python3
"""On-chip bench of the SAM ViTDet image encoder alone (batch 8, 1024²).

Usage: python tools/bench_sam_encoder.py [reps] [sam_ver] [backend] [gbackend] [wcp]
backend: packed_flat (default) | packed | flash | xla_aug   (windowed layers)
gbackend: packed (default) | flash            (global layers)
wcp: window-cols per program for the packed backend (default 0 = auto)
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
    ver = sys.argv[2] if len(sys.argv) > 2 else "vit_b"
    backend = sys.argv[3] if len(sys.argv) > 3 else "packed_flat"
    gbackend = sys.argv[4] if len(sys.argv) > 4 else "packed"
    wcp = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.utils.synthetic import synthetic_params

    sam = build_sam(ver, dtype=jnp.bfloat16, window_backend=backend,
                    global_backend=gbackend, window_wcp=wcp)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, sam.image_size, sam.image_size, 3)) * 0.5, jnp.float32)
    shapes = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1, sam.image_size, sam.image_size, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                           jnp.zeros((1, 4)))["params"], jax.random.PRNGKey(0))
    params = jax.device_put(synthetic_params(shapes), jax.devices()[0])
    jax.block_until_ready(params)
    print("params ready", flush=True)

    @jax.jit
    def prog(p, x):
        def body(i, acc):
            emb = sam.apply({"params": p}, jnp.roll(x, i, axis=0),
                            method=sam.encode_image)
            return acc + emb.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    # PTPU_SCOPED_VMEM_KIB: raise XLA's per-fusion scoped VMEM budget via
    # per-compile options (the CPU-side XLA_FLAGS parser rejects TPU-only
    # flags, but CompileOptions env overrides forward to the remote
    # compile) — r3 HLO forensics: the 16 MB default caps the vit_h fc2
    # conv emitter at a 64-wide K window
    scoped = os.environ.get("PTPU_SCOPED_VMEM_KIB")
    call = prog
    t0 = time.time()
    if scoped:
        call = prog.lower(params, x).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": scoped})
    float(call(params, x))
    comp = time.time() - t0
    best = 1e9
    for r in range(3):
        xr = jnp.roll(x, r + 1, axis=1)
        t0 = time.time(); float(call(params, xr))
        best = min(best, time.time() - t0)
    per = (best - 0.05) / reps * 1000
    print(f"sam {ver} encoder batch-8 [w={backend} g={gbackend} "
          f"wcp={wcp} scoped={scoped or 'dflt'}]: {per:.1f} ms/call "
          f"(compile {comp:.0f}s)", flush=True)

    if os.environ.get("TRACE"):
        with jax.profiler.trace("/tmp/samtrace"):
            float(call(params, jnp.roll(x, 9, axis=1)))
        from tools.trace_volume import parse_trace
        parse_trace("/tmp/samtrace")

    if os.environ.get("HLO_OUT"):
        compiled = call if scoped else prog.lower(params, x).compile()
        txt = compiled.as_text()
        with open(os.environ["HLO_OUT"], "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {os.environ['HLO_OUT']} "
              f"({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
