"""Predictor facade, RLE codec, polyp paired transforms."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.data.polyp_transforms import get_polyp_transform
from protosam_tpu.models.sam import build_sam
from protosam_tpu.models.sam.predictor import SamPredictor
from protosam_tpu.models.sam.rle import area_from_rle, mask_to_rle, rle_to_mask


def test_rle_roundtrip(rng):
    m = rng.random((17, 23)) > 0.6
    rle = mask_to_rle(m)
    assert rle["size"] == [17, 23]
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(back, m)
    assert area_from_rle(rle) == int(m.sum())
    # empty + full masks
    assert area_from_rle(mask_to_rle(np.zeros((4, 4), bool))) == 0
    assert area_from_rle(mask_to_rle(np.ones((4, 4), bool))) == 16


def test_predictor_facade(rng):
    sam = build_sam("vit_t", image_size=128)
    params = sam.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                      jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                      jnp.zeros((1, 4)))["params"]
    pred = SamPredictor(sam, params)
    img = rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
    pred.set_image(img)
    masks, ious, low = pred.predict(point_coords=[[60, 40]],
                                    point_labels=[1])
    assert masks.shape == (3, 96, 120) and masks.dtype == bool
    assert ious.shape == (3,)
    m1, i1, _ = pred.predict(point_coords=[[60, 40]], point_labels=[1],
                             box=[10, 10, 80, 80], multimask_output=False,
                             return_logits=True)
    assert m1.shape == (1, 96, 120) and m1.dtype != bool
    pred.reset_image()
    try:
        pred.predict(point_coords=[[1, 1]], point_labels=[1])
        raise AssertionError("expected RuntimeError after reset_image")
    except RuntimeError:
        pass


def test_polyp_transforms(rng):
    train, test = get_polyp_transform(rng=np.random.RandomState(0))
    img = rng.random((64, 64, 3)).astype(np.float32) * 255
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1
    ti, tm = train(img, mask)
    assert ti.shape == img.shape and tm.shape == mask.shape
    assert set(np.unique(tm)) <= {0.0, 1.0}
    si, sm = test(img, mask)
    np.testing.assert_array_equal(si, img)
