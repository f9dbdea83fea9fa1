"""Pallas CCA label propagation vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from protosam_tpu.ops.cca import label_components
from protosam_tpu.ops.cca_pallas import label_components_pallas

from tests.test_cca_prompts import random_blobs


@pytest.mark.parametrize("use_scratch", [True, False])
@pytest.mark.parametrize("seed", range(3))
def test_matches_xla_path(seed, use_scratch):
    rng = np.random.default_rng(seed)
    mask = random_blobs(rng, 64, 64, n=3, r=7)
    want = np.asarray(label_components(jnp.asarray(mask)))
    got = np.asarray(label_components_pallas(jnp.asarray(mask),
                                             interpret=True,
                                             use_scratch=use_scratch))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_scratch", [True, False])
def test_snake_converges(use_scratch):
    mask = np.zeros((32, 32), np.uint8)
    for r in range(0, 32, 4):
        mask[r, :] = 1
        if (r // 4) % 2 == 0:
            mask[r:r + 5, 31] = 1
        else:
            mask[r:r + 5, 0] = 1
    want = np.asarray(label_components(jnp.asarray(mask)))
    got = np.asarray(label_components_pallas(jnp.asarray(mask),
                                             interpret=True,
                                             use_scratch=use_scratch))
    np.testing.assert_array_equal(got, want)


def test_empty_mask():
    got = np.asarray(label_components_pallas(jnp.zeros((16, 16)),
                                             interpret=True))
    assert (got == 2**30).all()


def test_max_iters_threaded():
    """The fixpoint cap must reach the kernel: a capped run on a
    slow-converging mask stops early (iters == cap) and yields different
    labels than the converged run (the old kernel hard-capped at 64 —
    ADVICE r1)."""
    from protosam_tpu.ops.cca_pallas import _call

    rng = np.random.default_rng(0)
    m = jnp.asarray((rng.random((128, 128)) > 0.5).astype(np.int32))
    lbl_full, it_full = _call(m, True, 1024)
    lbl_cap, it_cap = _call(m, True, 3)
    assert int(it_cap[0, 0]) == 3
    assert int(it_full[0, 0]) > 64  # white noise: beyond the old hard cap
    assert int(jnp.sum(lbl_full != lbl_cap)) > 0
