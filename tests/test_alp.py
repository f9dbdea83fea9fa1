"""Golden parity: static-shape JAX ALP vs the reference MultiProtoAsConv."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from protosam_tpu.ops.alp import (
    alp_score,
    fg_score_with_fallback,
)

from tests.reference_compat import import_reference_alpmodule

alpmodule = import_reference_alpmodule()


def make_episode(rng, s=1, c=32, h=16, w=16, mask_frac=0.3):
    sup_fts = rng.standard_normal((s, c, h, w)).astype(np.float32)
    qry_fts = rng.standard_normal((1, c, h, w)).astype(np.float32)
    mask = (rng.random((s, 1, h, w)) < mask_frac).astype(np.float32)
    # carve a solid blob so some pooled cells clear the 0.95 threshold
    mask[:, :, 2:9, 3:11] = 1.0
    return sup_fts, qry_fts, mask


def reference_score(qry_fts, sup_fts, mask, mode, window, thresh=0.95):
    """Drive the reference MultiProtoAsConv.forward on CPU."""
    m = alpmodule.MultiProtoAsConv(proto_grid=[8, 8],
                                   feature_hw=[sup_fts.shape[-2], sup_fts.shape[-1]])
    qry = torch.from_numpy(qry_fts).unsqueeze(1)        # way, nb, C, H, W
    sup = torch.from_numpy(sup_fts).unsqueeze(0).unsqueeze(2)  # way, shot, nb, ...
    sup_y = torch.from_numpy(mask).unsqueeze(0)          # way, shot, nb(1ch), H, W
    with torch.no_grad():
        pred, _, _, _ = m(qry, sup, sup_y, mode=mode, thresh=thresh,
                          isval=True, val_wsize=window)
    return pred.numpy()


@pytest.mark.parametrize("mode", ["gridconv", "gridconv+", "mask"])
@pytest.mark.parametrize("s", [1, 3])
def test_alp_matches_reference(rng, mode, s):
    sup_fts, qry_fts, mask = make_episode(rng, s=s)
    window = 2
    want = reference_score(qry_fts, sup_fts, mask, mode, window)
    got = np.asarray(alp_score(jnp.asarray(qry_fts), jnp.asarray(sup_fts),
                               jnp.asarray(mask), mode, window, 0.95))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_alp_sparse_mask_matches_reference(rng):
    """A mask with few/no valid pooled cells (all below threshold)."""
    sup_fts, qry_fts, mask = make_episode(rng)
    mask[:] = 0.0
    mask[0, 0, 5, 5] = 1.0  # single pixel: no 2x2 avg clears 0.95
    window = 2
    got = np.asarray(alp_score(jnp.asarray(qry_fts), jnp.asarray(sup_fts),
                               jnp.asarray(mask), "gridconv", window, 0.95))
    # reference conv over an empty prototype set sums to exactly 0
    np.testing.assert_allclose(got, np.zeros_like(got), atol=0)


def test_fg_fallback_switches_to_mask_mode(rng):
    sup_fts, qry_fts, mask = make_episode(rng)
    # tiny mask: training-window (4) pooled max < 0.95 -> reference picks 'mask'
    mask[:] = 0.0
    mask[0, 0, 5:7, 5:7] = 1.0
    want = reference_score(qry_fts, sup_fts, mask, "mask", 2)
    got = np.asarray(fg_score_with_fallback(
        jnp.asarray(qry_fts), jnp.asarray(sup_fts), jnp.asarray(mask),
        window=2, fallback_window=4, thresh=0.95))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_fg_fallback_stays_gridconv_plus(rng):
    sup_fts, qry_fts, mask = make_episode(rng)
    want = reference_score(qry_fts, sup_fts, mask, "gridconv+", 2)
    got = np.asarray(fg_score_with_fallback(
        jnp.asarray(qry_fts), jnp.asarray(sup_fts), jnp.asarray(mask),
        window=2, fallback_window=4, thresh=0.95))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
