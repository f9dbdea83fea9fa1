"""The f32 coarse-logit tail (r5; PARITY.md bf16 drift reconciliation).

After the r4 selective-f32 decode tail, the remaining measured bf16 drift
entered UPSTREAM of the prompts: bf16 rounding in the DINOv2 final norm,
the ALP cosine match, and the logit upsample moved the coarse argmax that
seeds CCA and every SAM prompt (reference alpmodule.py:57-94 +
grid_proto_fewshot.py:270-273).  These stages are <1% of pipeline FLOPs,
so they now compute in f32 at true-f32 matmul precision under any build
dtype.  Pinned here:

* a bf16 DINOv2 build emits f32 ``x_norm_patchtokens`` (the final norm
  computes in f32),
* a bf16-built FewShotSeg's ALP scoring of a given f32 feature map is
  bit-equal to the f32 build's (same params, same inputs) — the match
  tail's numerics no longer depend on the build dtype,
* the full coarse forward of a bf16 build returns f32 logits.
"""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.dinov2.vit import build_dinov2


def test_bf16_dinov2_final_norm_is_f32():
    model = build_dinov2("dinov2_vitt14", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["x_norm_patchtokens"].dtype == jnp.float32
    assert out["x_norm_clstoken"].dtype == jnp.float32


def _score(module, qry, supp, fg, bg):
    # score() takes no parameters (pure ALP ops) — bind an empty scope
    return module.apply({"params": {}}, qry, supp, fg, bg, 2,
                        method=module.score)


def test_bf16_build_alp_tail_matches_f32_build():
    """Same f32 features through a bf16-configured vs f32-configured
    module -> bit-equal scores: the ALP tail computes in f32 either way."""
    rng = np.random.default_rng(0)
    qry = jnp.asarray(rng.standard_normal((1, 32, 16, 16)), jnp.float32)
    supp = jnp.asarray(rng.standard_normal((1, 32, 16, 16)), jnp.float32)
    fg = jnp.zeros((1, 16, 16)).at[:, 4:10, 5:12].set(1.0)
    bg = 1.0 - fg

    m_f32 = FewShotSeg(image_size=224, which_model="dinov2_t14",
                       dtype=jnp.float32)
    m_bf16 = FewShotSeg(image_size=224, which_model="dinov2_t14",
                        dtype=jnp.bfloat16)
    s32 = _score(m_f32, qry, supp, fg, bg)
    sbf = _score(m_bf16, qry, supp, fg, bg)
    assert s32.dtype == jnp.float32 and sbf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(s32), np.asarray(sbf))
    # and bf16-quantized features (what a bf16 encoder hands over) go
    # through the same f32 tail without dtype leakage
    sq = _score(m_bf16, qry.astype(jnp.bfloat16), supp.astype(jnp.bfloat16),
                fg, bg)
    assert sq.dtype == jnp.float32


def test_bf16_coarse_forward_emits_f32_logits():
    model = FewShotSeg(image_size=56, which_model="dinov2_t14",
                       dtype=jnp.bfloat16)
    supp = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 56, 56))
    fg = jnp.zeros((1, 56, 56)).at[:, 18:38, 18:38].set(1.0)
    qry = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    params = model.init(jax.random.PRNGKey(2), supp, fg, 1 - fg,
                        qry)["params"]
    out = model.apply({"params": params}, supp, fg, 1 - fg, qry)
    assert out["logits"].dtype == jnp.float32
