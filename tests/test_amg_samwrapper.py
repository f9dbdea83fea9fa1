"""AMG + SamWrapper tests (tiny SAM, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam import build_sam
from protosam_tpu.models.sam.amg import (
    SamAutomaticMaskGenerator,
    box_iou,
    build_point_grid,
    mask_to_box,
    nms_keep,
    stability_score,
)
from protosam_tpu.models.samwrapper import SamWrapper


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() == 1 / 8 and g.max() == 1 - 1 / 8


def test_mask_to_box_and_iou():
    m = jnp.zeros((2, 16, 16), bool)
    m = m.at[0, 2:6, 3:9].set(True)
    boxes = mask_to_box(m)
    np.testing.assert_array_equal(np.asarray(boxes[0]), [3, 2, 8, 5])
    np.testing.assert_array_equal(np.asarray(boxes[1]), [0, 0, 0, 0])
    iou = box_iou(jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.],
                               [20., 20., 30., 30.]]))
    assert float(iou[0, 1]) == pytest.approx(25 / 175, abs=1e-5)
    assert float(iou[0, 2]) == 0.0


def test_nms_keep():
    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                         [20., 20., 30., 30.]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_keep(boxes, scores, jnp.ones(3, bool), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_stability_score():
    logits = jnp.full((1, 8, 8), 5.0).at[0, :4].set(-5.0)
    s = stability_score(logits, 0.0, 1.0)
    assert float(s[0]) == 1.0


@pytest.mark.parametrize("hw", [(96, 96)])
def test_samwrapper_oracle(hw):
    rng = jax.random.PRNGKey(0)
    sam = build_sam("vit_t", image_size=128)
    params = sam.init(rng, jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 1, 2)),
                      jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    wrapper = SamWrapper(sam, params, points_per_side=4, points_per_batch=8,
                         pred_iou_thresh=-10.0, stability_score_thresh=-1.0)
    img = np.random.default_rng(0).integers(0, 255, (*hw, 3)).astype(np.uint8)
    gt = np.zeros(hw, np.uint8)
    gt[30:60, 30:60] = 1
    best = wrapper(img, gt)
    assert best.shape == hw
    assert np.isfinite(best).all()
