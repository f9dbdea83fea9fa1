"""Batched coarse inference must equal per-slice inference exactly — the
foundation of the volume throughput path."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg


def test_batched_queries_equal_loop(rng):
    model = FewShotSeg(image_size=126, which_model="dinov2_t14")
    supp = jnp.asarray(rng.standard_normal((1, 3, 126, 126)), jnp.float32)
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    queries = jnp.asarray(rng.standard_normal((3, 3, 126, 126)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), supp, fg, 1 - fg,
                        queries[:1])["params"]

    batched = model.apply({"params": params}, supp, fg, 1 - fg, queries)

    for i in range(3):
        single = model.apply({"params": params}, supp, fg, 1 - fg,
                             queries[i:i + 1])
        np.testing.assert_allclose(
            np.asarray(batched["logits"][i]),
            np.asarray(single["logits"][0]), atol=2e-5, rtol=1e-4)


def test_cached_support_features_equal_recompute(rng):
    """Passing precomputed supp_fts (the per-volume cache) must match the
    joint-encode path (encoding is per-sample: LayerNorm/attention never mix
    batch elements)."""
    model = FewShotSeg(image_size=126, which_model="dinov2_t14")
    supp = jnp.asarray(rng.standard_normal((1, 3, 126, 126)), jnp.float32)
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    qry = jnp.asarray(rng.standard_normal((1, 3, 126, 126)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), supp, fg, 1 - fg,
                        qry)["params"]

    joint = model.apply({"params": params}, supp, fg, 1 - fg, qry)
    supp_fts = model.apply({"params": params}, supp,
                           method=model.get_features)
    cached = model.apply({"params": params}, supp, fg, 1 - fg, qry,
                         supp_fts=supp_fts)
    np.testing.assert_allclose(np.asarray(joint["logits"]),
                               np.asarray(cached["logits"]),
                               atol=2e-5, rtol=1e-4)
