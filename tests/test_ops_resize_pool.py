"""Parity tests: resize/pool/norm ops vs torch CPU reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from protosam_tpu.ops import (
    avg_pool2d,
    cosine_similarity,
    resize_bilinear,
    resize_bilinear_antialias,
    resize_nearest,
    safe_l2_normalize,
)
from protosam_tpu.ops.resize import longest_side_size


SIZES = [((7, 9), (32, 32)), ((32, 32), (7, 9)), ((252, 252), (32, 32)),
         ((32, 32), (252, 252)), ((48, 48), (672, 672))]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear").numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, 2, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("in_hw,out_hw", [((512, 389), (1024, 778)),
                                          ((1024, 778), (256, 194)),
                                          ((672, 672), (1024, 1024))])
def test_bilinear_antialias_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                         align_corners=False, antialias=True).numpy()
    got = np.asarray(resize_bilinear_antialias(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("window", [2, 4, 7])
def test_avg_pool_matches_torch(rng, window):
    x = rng.standard_normal((2, 5, 48, 48)).astype(np.float32)
    want = F.avg_pool2d(torch.from_numpy(x), window).numpy()
    got = np.asarray(avg_pool2d(jnp.asarray(x), window))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_safe_norm_matches_reference(rng):
    x = rng.standard_normal((17, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    n = torch.norm(xt, p=2, dim=1)
    want = (xt / torch.max(n, torch.ones_like(n) * 1e-4).unsqueeze(1)).numpy()
    got = np.asarray(safe_l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cosine_similarity_matches_torch(rng):
    a = rng.standard_normal((8, 32)).astype(np.float32)
    b = rng.standard_normal((8, 32)).astype(np.float32)
    want = F.cosine_similarity(torch.from_numpy(a), torch.from_numpy(b),
                               dim=1, eps=1e-4).numpy()
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b), axis=1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_longest_side_size():
    # reference transforms.py:141-148
    assert longest_side_size(512, 389, 1024) == (1024, 778)
    assert longest_side_size(389, 512, 1024) == (778, 1024)
    assert longest_side_size(1024, 1024, 1024) == (1024, 1024)


@pytest.mark.parametrize("in_hw,mid_hw,out_hw", [
    ((64, 64), (256, 256), (168, 168)),   # decode-tail geometry, scaled down
    ((16, 16), (64, 64), (64, 64)),       # mid == out: plain bilinear
    ((9, 7), (33, 31), (13, 17)),         # ragged sizes
])
def test_bilinear_then_nearest_composed(rng, in_hw, mid_hw, out_hw):
    """The composed resize selects rows of the bilinear weight matrix at the
    nearest source indices — same taps, same weights as the two-step form.
    Values agree to ~1 ulp (the backend's dot FMA/reassociation strategy
    varies with output width), which is what golden-mask stability needs."""
    from protosam_tpu.ops.resize import resize_bilinear_then_nearest

    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    two_step = np.asarray(
        resize_nearest(resize_bilinear(jnp.asarray(x), mid_hw), out_hw))
    composed = np.asarray(
        resize_bilinear_then_nearest(jnp.asarray(x), mid_hw, out_hw))
    np.testing.assert_allclose(composed, two_step, atol=2e-6, rtol=1e-6)
