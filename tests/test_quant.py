"""Dynamic W8A8 int8 dense path (ops/quant; r5).

The v5e MXU runs int8 dots at ~2x the bf16 peak; the encoders' dense
stages are already at ~97% of the bf16 peak (ROUND_NOTES r4), so int8 is
the only remaining single-chip lever past the 45.7 slices/sec bf16 flop
ceiling (tools/roofline.py).  Pinned here:

* int8_dense approximates the fp matmul with per-token/per-channel
  symmetric scaling (error bounded by the quantization step),
* QuantDense has the EXACT param tree of nn.Dense (checkpoint compat),
* quant builds of both encoders run and track the fp build's features
  (cosine similarity — the quantity ALP matching consumes).
"""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.ops.quant import QuantDense, int8_dense


def test_int8_dense_approximates_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    y = int8_dense(x, w, b, out_dtype=jnp.float32)
    ref = x @ w + b
    # per-element error is bounded by the dot of the quantization steps:
    # |dy| <= K*(|x|max/127 * |w|max/127-ish); empirically ~1% relative
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # batched (B, H, W, K) input contracts the last dim like nn.Dense
    x4 = x.reshape(4, 4, 4, 96)
    y4 = int8_dense(x4, w, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y4.reshape(64, 128)),
                               np.asarray(y), rtol=0, atol=0)


def test_quant_dense_param_tree_matches_nn_dense():
    import flax.linen as nn

    x = jnp.ones((2, 16))
    pq = QuantDense(24).init(jax.random.PRNGKey(0), x)["params"]
    pd = nn.Dense(24).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
    assert all(a.shape == b.shape and a.dtype == b.dtype
               for a, b in zip(jax.tree_util.tree_leaves(pq),
                               jax.tree_util.tree_leaves(pd)))


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quant_dinov2_tracks_fp_features():
    from protosam_tpu.models.dinov2.vit import build_dinov2

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3), jnp.float32)
    fp = build_dinov2("dinov2_vitt14", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(1), x)["params"]
    q = build_dinov2("dinov2_vitt14", dtype=jnp.float32, quant_dense=True)
    # same params drive both builds (the param trees are identical)
    f_fp = fp.apply({"params": params}, x)["x_norm_patchtokens"]
    f_q = q.apply({"params": params}, x)["x_norm_patchtokens"]
    assert f_q.shape == f_fp.shape and bool(jnp.isfinite(f_q).all())
    assert _cos(f_fp, f_q) > 0.99


def test_quant_sam_encoder_tracks_fp_embedding():
    from protosam_tpu.models.sam import build_sam

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 3),
                          jnp.float32)
    fp = build_sam("vit_t", dtype=jnp.float32, image_size=128)
    params = fp.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)),
                     jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                     jnp.zeros((1, 4)))["params"]
    q = build_sam("vit_t", dtype=jnp.float32, image_size=128,
                  quant_dense=True)
    e_fp = fp.apply({"params": params}, x, method=fp.encode_image)
    e_q = q.apply({"params": params}, x, method=q.encode_image)
    assert e_q.shape == e_fp.shape and bool(jnp.isfinite(e_q).all())
    assert _cos(e_fp, e_q) > 0.99
