"""Fused Pallas ALP kernel vs the jnp reference implementation
(interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from protosam_tpu.ops.alp import Prototypes, grid_prototypes, score_prototypes
from protosam_tpu.ops.alp_pallas import alp_match_fused


def test_fused_matches_reference(rng):
    n, c, h, w = 2, 64, 16, 16
    qry = jnp.asarray(rng.standard_normal((n, c, h, w)), jnp.float32)
    sup = jnp.asarray(rng.standard_normal((1, c, h, w)), jnp.float32)
    mask = jnp.zeros((1, 1, h, w)).at[:, :, 3:12, 4:13].set(1.0)

    protos = grid_prototypes(sup, mask, window=2, thresh=0.95)
    want = np.asarray(score_prototypes(qry, protos))
    got = np.asarray(alp_match_fused(qry, protos.protos, protos.valid,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_all_invalid_is_zero(rng):
    qry = jnp.asarray(rng.standard_normal((1, 32, 8, 8)), jnp.float32)
    protos = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    valid = jnp.zeros(16, bool)
    got = np.asarray(alp_match_fused(qry, protos, valid, interpret=True))
    np.testing.assert_allclose(got, 0.0, atol=0)
