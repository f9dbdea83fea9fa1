"""Legacy validation helpers from the reference's util grab-bag.

Reference ``util/utils.py:411-425`` (sliding-window confidence
segmentation) and ``:436-461`` (kneedle threshold selection).  These are
dead code in the reference — no shipped config exercises them (PARITY.md)
— but they complete the component inventory (SURVEY.md §2.4) for users
who drove them from their own scripts.

Deviations from the reference, on purpose:

* ``sliding_window_confidence_segmentation`` there builds a
  ``sliding_window_view`` whose window SPANS THE BATCH AXIS, so with B>1
  the window means mix slices; the ``[..., 0]`` tail-index then drops all
  but one spatial column of the result.  Both are artifacts of the numpy
  stride trick, not intent (the commented-out loop version directly above
  it, :391-409, is per-image 2-D).  This implementation is the per-image
  2-D box mean the loop version computes, zero-padded, centered.
* ``choose_threshold_kneedle`` there depends on the ``kneed`` package and
  writes matplotlib debug figures; this is a self-contained Kneedle
  (Satopaa et al. 2011) on the probability CDF — normalize to the unit
  square and take the point of maximum deviation below the identity
  chord, which is the knee of a convex increasing curve — with the same
  return contract (a threshold drawn from the histogram bin edges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_confidence_segmentation(conf: jax.Array,
                                           window_size: int = 3,
                                           threshold: float = 0.5) -> jax.Array:
    """Binary segmentation by thresholding the local mean confidence.

    conf: (B, H, W) per-pixel confidence.  Returns int32 (B, H, W) where
    the ``window_size``-square box mean (zero padding outside, like the
    reference's ``np.pad`` constant mode) exceeds ``threshold``.
    Reference util/utils.py:411-425.
    """
    pad = window_size // 2
    summed = jax.lax.reduce_window(
        conf, 0.0, jax.lax.add,
        window_dimensions=(1, window_size, window_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)))
    mean = summed / float(window_size * window_size)
    return (mean > threshold).astype(jnp.int32)


def choose_threshold_kneedle(p: np.ndarray) -> float:
    """Pick a binarization threshold at the knee of the probability CDF.

    p: 1-D array of predicted probabilities.  Histograms ``p`` into
    ``min(100, len(p))`` bins, builds the CDF, and returns the bin edge at
    the Kneedle knee of the (convex, increasing) CDF — the x of maximum
    deviation below the identity chord on the normalized curve.
    Reference util/utils.py:436-461 (via kneed.KneeLocator).
    """
    p = np.asarray(p).reshape(-1)
    n_bins = min(100, len(p))
    if n_bins < 2:
        return float(p[0]) if len(p) else 0.5
    hist, bin_edges = np.histogram(p, bins=n_bins)
    cdf = np.cumsum(hist / max(hist.sum(), 1))

    x = np.linspace(0.0, 1.0, n_bins)
    y = (cdf - cdf.min()) / max(cdf.max() - cdf.min(), 1e-12)
    knee_idx = int(np.argmax(x - y))
    return float(bin_edges[knee_idx])
