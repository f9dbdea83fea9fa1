"""Device CCA + prompt extraction vs cv2 / reference CPU logic."""

import cv2
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from protosam_tpu.ops.cca import (
    component_confidences,
    connected_components,
    keep_most_confident,
)
from protosam_tpu.ops.morphology import dilate
from protosam_tpu.ops.prompts import build_sam_prompts, topk_points


def random_blobs(rng, h=96, w=96, n=4, r=9):
    mask = np.zeros((h, w), np.uint8)
    for _ in range(n):
        cy, cx = rng.integers(r, h - r), rng.integers(r, w - r)
        yy, xx = np.ogrid[:h, :w]
        mask[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return mask


@pytest.mark.parametrize("seed", range(5))
def test_labels_match_cv2(seed):
    rng = np.random.default_rng(seed)
    mask = random_blobs(rng)
    n_cv, lbl_cv, stats_cv, cent_cv = cv2.connectedComponentsWithStats(
        mask, connectivity=8)
    got = connected_components(jnp.asarray(mask), max_ccs=8)
    assert int(got.num) == n_cv - 1
    np.testing.assert_array_equal(np.asarray(got.labels), lbl_cv)
    for i in range(n_cv - 1):
        assert bool(got.valid[i])
        x, y, bw, bh, area = stats_cv[i + 1]
        assert int(got.areas[i]) == area
        np.testing.assert_array_equal(np.asarray(got.bboxes[i]),
                                      [x, y, x + bw - 1, y + bh - 1])
        np.testing.assert_allclose(np.asarray(got.centroids[i]), cent_cv[i + 1],
                                   atol=1e-4)
    assert not bool(got.valid[n_cv - 1]) if n_cv - 1 < 8 else True


def test_empty_mask():
    got = connected_components(jnp.zeros((32, 32)), max_ccs=4)
    assert int(got.num) == 0
    assert not bool(got.valid.any())
    np.testing.assert_array_equal(np.asarray(got.labels), 0)


def test_snake_shape_converges():
    """A long winding component stresses propagation depth."""
    mask = np.zeros((64, 64), np.uint8)
    for r in range(0, 64, 4):
        mask[r, :] = 1
        if (r // 4) % 2 == 0:
            mask[r:r + 5, 63] = 1
        else:
            mask[r:r + 5, 0] = 1
    n_cv, lbl_cv, _, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    got = connected_components(jnp.asarray(mask), max_ccs=4)
    assert int(got.num) == n_cv - 1 == 1
    np.testing.assert_array_equal(np.asarray(got.labels), lbl_cv)


def test_confidence_and_cca_keep_best(rng):
    mask = random_blobs(rng, n=3)
    probs = rng.random(mask.shape).astype(np.float32) * mask
    stats = connected_components(jnp.asarray(mask), max_ccs=8)
    conf = component_confidences(stats, jnp.asarray(probs), jnp.asarray(mask, dtype=jnp.float32))
    # reference formula: sum(probs * cc) / (sum(pred) + 1e-6)  (utils.py:485-492)
    lbl = np.asarray(stats.labels)
    for i in range(int(stats.num)):
        want = (probs * (lbl == i + 1)).sum() / (mask.sum() + 1e-6)
        np.testing.assert_allclose(float(conf[i]), want, rtol=1e-5)
    best = np.asarray(keep_most_confident(stats, conf))
    want_best = lbl == (np.argmax(np.asarray(conf)) + 1)
    np.testing.assert_array_equal(best, want_best)


def test_dilate_matches_cv2(rng):
    mask = random_blobs(rng, n=2)
    want = cv2.dilate(mask * 255, np.ones((3, 3), np.uint8), iterations=10)
    got = np.asarray(dilate(jnp.asarray(mask * 255), 3, 10))
    np.testing.assert_array_equal(got, want)


def test_topk_points_matches_reference(rng):
    """vs reference get_most_conf_points (ProtoSAM.py:266-289) on torch CPU."""
    prob = rng.random((40, 40)).astype(np.float32)
    mask = random_blobs(rng, 40, 40, n=1)
    k = 3
    # reference logic
    m = torch.from_numpy(mask).bool()
    masked = torch.from_numpy(prob)[m]
    confs, idxs = torch.topk(masked, k)
    locs = torch.nonzero(m)[idxs][:, [1, 0]].numpy().astype(np.float32)
    got_xy, got_c = topk_points(jnp.asarray(prob), jnp.asarray(mask), k)
    np.testing.assert_allclose(np.asarray(got_c), confs.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_xy), locs)


def test_build_sam_prompts_shapes(rng):
    mask = random_blobs(rng, n=2)
    prob = rng.random(mask.shape).astype(np.float32)
    stats = connected_components(jnp.asarray(mask), max_ccs=6)
    pp = build_sam_prompts(jnp.asarray(prob), jnp.asarray(1 - prob), stats,
                           num_points=1, point_mode="both", use_neg_points=True)
    k = 6
    assert pp.coords.shape == (k, 1 + 1 + 1 + 1, 2)  # conf + centroid + ring-neg + global-neg
    assert pp.labels.shape == pp.valid.shape == (k, 4)
    v = np.asarray(pp.valid)
    lab = np.asarray(pp.labels)
    n = int(stats.num)
    assert (lab[:n, :2] == 1).all()
    assert set(np.unique(lab[:n, 2:])) <= {0, -1}
    assert (lab[n:] == -1).all() and not v[n:].any()
    assert np.isfinite(np.asarray(pp.coords)).all()
