"""Fused Pallas MLP kernel (ops/mlp_pallas) correctness.

Interpret-mode runs the real kernel body on CPU; the reference is the same
arithmetic (f32-accumulated dots, f32 tanh GELU) composed from jnp ops.
Also pins that MLPBlock's ``fuse_tpu`` path keeps the param tree and falls
back to the Dense composition off-TPU (lax.platform_dependent).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.ops.mlp_pallas import mlp_fused


def _reference(x, w1, b1, w2, b2, residual=None):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    g = jax.nn.gelu(h, approximate=True)
    y = jnp.dot(g.astype(x.dtype), w2, preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize("m,c,h", [(256, 128, 512), (96, 256, 384)])
@pytest.mark.parametrize("with_residual", [True, False])
def test_mlp_fused_interpret_matches_reference(rng, m, c, h, with_residual):
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, h)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((h, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.bfloat16)
    res = (jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
           if with_residual else None)
    got = mlp_fused(x, w1, b1, w2, b2, residual=res, interpret=True)
    want = _reference(x, w1, b1, w2, b2, residual=res)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mlp_block_fuse_flag_param_tree_and_cpu_fallback(rng):
    """fuse_tpu must not change the param tree, and on CPU it must produce
    the plain Dense composition (platform_dependent fallback)."""
    from protosam_tpu.models.layers import MLPBlock

    x = jnp.asarray(rng.standard_normal((32, 64)), jnp.bfloat16)
    mod = MLPBlock(mlp_dim=128, dtype=jnp.bfloat16)
    p_plain = mod.init(jax.random.PRNGKey(0), x)
    p_fused = mod.init(jax.random.PRNGKey(0), x, residual=x, fuse_tpu=True)
    assert (jax.tree_util.tree_structure(p_plain)
            == jax.tree_util.tree_structure(p_fused))
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_fused)):
        assert a.shape == b.shape

    plain = mod.apply(p_plain, x) + x
    fused = mod.apply(p_plain, x, residual=x, fuse_tpu=True)
    np.testing.assert_allclose(np.asarray(plain, np.float32),
                               np.asarray(fused, np.float32),
                               atol=1e-6, rtol=1e-6)


def test_dense_residual_interpret_matches_reference(rng):
    from protosam_tpu.ops.mlp_pallas import dense_residual

    m, c, n = 128, 64, 64
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n,)) * 0.1, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
    got = dense_residual(x, w, b, res, interpret=True)
    want = (jnp.dot(x, w, preferred_element_type=jnp.float32)
            + b.astype(jnp.float32) + res.astype(jnp.float32)
            ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_block_proj_pallas_knob_cpu_fallback(rng, monkeypatch):
    """PTPU_PROJ_PALLAS=1 routes the attn residual through Attention; on CPU
    the platform_dependent fallback must reproduce the default composition."""
    from protosam_tpu.models.sam.image_encoder import Block

    monkeypatch.delenv("PTPU_PROJ_PALLAS", raising=False)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.bfloat16)
    blk = Block(num_heads=4, use_rel_pos=True, window_size=4, grid_size=8,
                embed_dim=32, dtype=jnp.bfloat16)
    p = blk.init(jax.random.PRNGKey(0), x, jnp.asarray(True))
    base, _ = blk.apply(p, x, jnp.asarray(True))
    monkeypatch.setenv("PTPU_PROJ_PALLAS", "1")
    fused, _ = blk.apply(p, x, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(base, np.float32),
                               atol=1e-6, rtol=1e-6)
