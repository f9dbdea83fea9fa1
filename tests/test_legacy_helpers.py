"""Legacy validation helpers (reference util/utils.py:411-461)."""

import numpy as np
import jax.numpy as jnp

from protosam_tpu.utils.legacy import (
    choose_threshold_kneedle,
    sliding_window_confidence_segmentation,
)


def test_sliding_window_matches_loop_reference(rng):
    """Must equal the reference's per-image loop semantics
    (util/utils.py:391-409): centered window mean with zero padding."""
    conf = rng.random((2, 12, 17)).astype(np.float32)
    ws, thr = 3, 0.5
    pad = ws // 2
    padded = np.pad(conf, ((0, 0), (pad, pad), (pad, pad)))
    want = np.zeros_like(conf, dtype=int)
    for b in range(conf.shape[0]):
        for i in range(conf.shape[1]):
            for j in range(conf.shape[2]):
                win = padded[b, i:i + ws, j:j + ws]
                want[b, i, j] = int(win.mean() > thr)

    got = np.asarray(sliding_window_confidence_segmentation(
        jnp.asarray(conf), ws, thr))
    np.testing.assert_array_equal(got, want)


def test_sliding_window_5(rng):
    conf = rng.random((1, 9, 9)).astype(np.float32)
    got = np.asarray(sliding_window_confidence_segmentation(
        jnp.asarray(conf), 5, 0.45))
    pad = 2
    padded = np.pad(conf[0], pad)
    want = np.array([[int(padded[i:i + 5, j:j + 5].mean() > 0.45)
                      for j in range(9)] for i in range(9)])
    np.testing.assert_array_equal(got[0], want)


def test_kneedle_threshold_on_convex_cdf():
    """The reference hardcodes KneeLocator(curve='convex',
    direction='increasing') — a CDF that stays flat then rises steeply
    (probability mass concentrated at HIGH p, a sparse low tail).  The
    knee must land where the curve bends: above the flat tail, below the
    dense mode."""
    rng = np.random.default_rng(0)
    tail = rng.uniform(0.0, 1.0, size=300)    # thin uniform tail
    mode = rng.beta(30, 3, size=6000)         # dense mass near 0.91
    p = np.concatenate([tail, mode])
    thr = choose_threshold_kneedle(p)
    assert 0.4 < thr < float(np.median(mode))
    # degenerate inputs keep the contract
    assert choose_threshold_kneedle(np.array([0.3])) == 0.3
    assert choose_threshold_kneedle(np.array([])) == 0.5
