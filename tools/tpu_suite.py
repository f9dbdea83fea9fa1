#!/usr/bin/env python3
"""On-TPU validation + timing suite (run after any big change).

Ordered stages, each printed with compile time and honest steady-state
timing (scalar host reads; inputs varied per call to defeat the terminal's
execution cache).  Usage:  python tools/tpu_suite.py [stage ...]
Stages: calib sam dino cca cca_pallas alp full
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(name, f, args_fn, n=4):
    t0 = time.time()
    float(f(*args_fn(99)))
    print(f"{name} compile+first: {time.time() - t0:.0f}s", flush=True)
    # materialize inputs BEFORE the clock starts — args_fn costs (random
    # generation of ~100 MB arrays) must not pollute the measurement
    args = [args_fn(i) for i in range(n)]
    for a in args:
        for x in jax.tree.leaves(a):
            x.block_until_ready()
    t0 = time.time()
    for i in range(n):
        v = float(f(*args[i]))
    print(f"{name}: {(time.time() - t0) / n * 1000:.1f} ms (last={v:.4g})",
          flush=True)


def stage_calib():
    A = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)

    def mm(x, k):
        for _ in range(10):
            x = (x @ x) * 1e-4 + k
        return jnp.sum(x.astype(jnp.float32))

    bench("matmul 11TF", jax.jit(mm), lambda i: (A, jnp.bfloat16(i * 1e-6)))


def stage_sam():
    from protosam_tpu.models.sam import build_sam

    from protosam_tpu.utils.synthetic import synthetic_params

    sam = build_sam("vit_b", dtype=jnp.bfloat16)
    # eval_shape + host fill: no init forward (an eager bf16 forward on
    # the CPU backend hits unsupported mixed-dtype DotThunks, and takes
    # minutes besides)
    shapes = jax.eval_shape(
        lambda r: sam.init(r, jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                           jnp.zeros((1, 4)))["params"],
        jax.random.PRNGKey(0))
    sp = jax.device_put(synthetic_params(shapes), jax.devices()[0])
    f = jax.jit(lambda p, x: jnp.sum(sam.apply(
        {"params": p}, x, method=sam.encode_image).astype(jnp.float32)))
    bench("sam-b encode batch8", f,
          lambda i: (sp, jax.random.normal(jax.random.PRNGKey(i),
                                           (8, 1024, 1024, 3))))


def stage_dino():
    from protosam_tpu.models.dinov2.vit import build_dinov2

    from protosam_tpu.utils.synthetic import synthetic_params

    dino = build_dinov2("dinov2_vitl14", dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r: dino.init(r, jnp.zeros((1, 672, 672, 3)))["params"],
        jax.random.PRNGKey(1))
    dp = jax.device_put(synthetic_params(shapes), jax.devices()[0])
    f = jax.jit(lambda p, x: jnp.sum(dino.apply(
        {"params": p}, x)["x_norm_patchtokens"].astype(jnp.float32)))
    bench("dinov2-L flash batch8", f,
          lambda i: (dp, jax.random.normal(jax.random.PRNGKey(i),
                                           (8, 672, 672, 3))))


def _blob_masks(i, b=8, hw=1024):
    yy, xx = np.mgrid[:hw, :hw]
    m = np.zeros((b, hw, hw), np.float32)
    for k in range(b):
        for cy, cx, r in [(300 + 10 * i + 5 * k, 300, 90),
                          (700, 600 - 7 * i, 60)]:
            m[k][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return jax.device_put(jnp.asarray(m))


def stage_cca():
    from protosam_tpu.ops.cca import connected_components

    f = jax.jit(lambda m: jnp.sum(jax.vmap(
        lambda s: connected_components(s, 8).labels)(m).astype(jnp.float32)))
    bench("XLA CCA batch8", f, lambda i: (_blob_masks(i),))


def stage_cca_pallas():
    from protosam_tpu.ops.cca import label_components
    from protosam_tpu.ops.cca_pallas import label_components_pallas

    m = _blob_masks(0)[0]
    a = np.asarray(label_components(m))
    b = np.asarray(label_components_pallas(m, interpret=False))
    print("pallas CCA correct:", bool((a == b).all()), flush=True)
    f = jax.jit(lambda mm: jnp.sum(jax.vmap(
        lambda s: label_components_pallas(s, interpret=False))(mm)
        .astype(jnp.float32)))
    bench("pallas CCA batch8", f, lambda i: (_blob_masks(i),))


def stage_alp():
    from protosam_tpu.ops.alp import grid_prototypes, score_prototypes
    from protosam_tpu.ops.alp_pallas import alp_match_fused

    sup = jax.random.normal(jax.random.PRNGKey(0), (1, 1024, 48, 48))
    mask = jnp.zeros((1, 1, 48, 48)).at[:, :, 10:30, 12:36].set(1.0)
    protos = grid_prototypes(sup, mask, 2, 0.95)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (8, 1024, 48, 48))
    want = float(jnp.sum(score_prototypes(q0, protos)))
    got = float(jnp.sum(alp_match_fused(q0, protos.protos, protos.valid,
                                        interpret=False)))
    print(f"fused ALP correct: {abs(want - got) / max(abs(want), 1e-9):.2e} "
          f"rel err", flush=True)
    f1 = jax.jit(lambda q: jnp.sum(score_prototypes(q, protos)))
    f2 = jax.jit(lambda q: jnp.sum(alp_match_fused(q, protos.protos,
                                                   protos.valid,
                                                   interpret=False)))
    mk = lambda i: (jax.random.normal(jax.random.PRNGKey(i),
                                      (8, 1024, 48, 48)),)
    bench("ALP jnp batch8", f1, mk)
    bench("ALP fused batch8", f2, mk)


def stage_vitdet_flash():
    from protosam_tpu.models.sam.image_encoder import _rel_pos_table
    from protosam_tpu.ops.vitdet_flash import flash_attention_relpos

    b, h, w, nh, d = 8, 64, 64, 12, 64
    s = h * w
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, nh, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, nh, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, nh, d), jnp.float32)
    rel = jax.random.normal(jax.random.PRNGKey(3), (127, d)) * 0.05
    Rh = _rel_pos_table(rel, h, h)
    Rw = _rel_pos_table(rel, w, w)

    # correctness vs chunked reference on one batch
    from protosam_tpu.models.sam.image_encoder import _attend
    rq = q[:1].reshape(1, h, w, nh, d)
    want = _attend(rq, k[:1], v[:1], Rh, Rw, nh, d ** -0.5, (h, w), True,
                   jnp.float32)
    got = flash_attention_relpos(q[:1], k[:1], v[:1], Rh, Rw, (h, w),
                                 d ** -0.5, rows_per_blk=8, interpret=False)
    err = float(jnp.abs(want - got.reshape(want.shape)).max())
    print(f"vitdet flash max err vs chunked: {err:.2e}", flush=True)

    f = jax.jit(lambda q, k, v: jnp.sum(flash_attention_relpos(
        q, k, v, Rh, Rw, (h, w), d ** -0.5, rows_per_blk=8,
        interpret=False).astype(jnp.float32)))
    bench("vitdet flash batch8 (1 layer)", f,
          lambda i: (q + i * 1e-5, k, v))
    g = jax.jit(lambda rq, k, v: jnp.sum(jax.lax.map(
        lambda a: _attend(a[0], k, v, a[1], Rw, nh, d ** -0.5, (h, w),
                          True, jnp.float32),
        (rq, Rh.reshape(8, 8, h, d))).astype(jnp.float32)))
    rq8 = q.reshape(b, 8, 8, w, nh, d).transpose(1, 0, 2, 3, 4, 5)
    bench("chunked attn batch8 (1 layer)", g, lambda i: (rq8 + i * 1e-5, k, v))


STAGES = {"calib": stage_calib, "sam": stage_sam, "dino": stage_dino,
          "cca": stage_cca, "cca_pallas": stage_cca_pallas,
          "alp": stage_alp, "vitdet_flash": stage_vitdet_flash}


if __name__ == "__main__":
    which = sys.argv[1:] or list(STAGES)
    print("devices:", jax.devices(), flush=True)
    for name in which:
        STAGES[name]()
    print("SUITE DONE", flush=True)
