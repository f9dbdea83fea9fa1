"""AMG completeness: crop layers, small-region postprocess, RLE output modes
(reference automatic_mask_generator.py:45-51,94 + utils/amg.py:190-300)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_coco_rle_roundtrip():
    """coco_encode_rle must invert through coco_decode_rle for arbitrary
    masks (the codec is the pycocotools rleToString/rleFrString pair)."""
    from protosam_tpu.models.sam.rle import (
        coco_decode_rle,
        coco_encode_rle,
        mask_to_rle,
        rle_to_mask,
    )

    rng = np.random.default_rng(0)
    for shape in ((7, 5), (32, 32), (63, 17)):
        for density in (0.0, 0.2, 0.5, 1.0):
            mask = rng.random(shape) < density
            rle = mask_to_rle(mask)
            enc = coco_encode_rle(rle)
            assert isinstance(enc["counts"], str)
            dec = coco_decode_rle(enc)
            assert dec["counts"] == rle["counts"], (shape, density)
            np.testing.assert_array_equal(rle_to_mask(dec), mask)


def test_coco_rle_fixed_vectors():
    """Hand-derived vectors from pycocotools' maskApi.c rleToString
    algorithm (5 data bits + continuation bit, ASCII offset 48, delta vs
    counts[i-2] from index 3 on) — guards the encoding against drift;
    pycocotools itself is not installed in this environment."""
    from protosam_tpu.models.sam.rle import coco_encode_rle

    # counts [5,3,4,4]: index 3 deltas to 4-3=1 -> chars 5,3,4,1
    assert coco_encode_rle(
        {"size": [4, 4], "counts": [5, 3, 4, 4]})["counts"] == "5341"
    # negative delta: [3,10,2,4] -> index 3: 4-10=-6 -> single char 'J'
    # (-6 & 0x1f = 26, sign bit 0x10 set, arithmetic shift ends at -1)
    assert coco_encode_rle(
        {"size": [4, 4], "counts": [3, 10, 2, 4]})["counts"] == "3:2J"
    # multi-char: a run of 100 needs two 5-bit chunks (4 | cont, then 3)
    assert coco_encode_rle(
        {"size": [10, 10], "counts": [100]})["counts"] == "T3"


def test_remove_small_regions_matches_reference():
    """Our CCA-based remove_small_regions vs the reference's cv2 version
    on random blobby masks, both modes."""
    from tests.reference_compat import _install_reference_stubs

    _install_reference_stubs()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_amg_utils",
        "/root/reference/models/segment_anything/utils/amg.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from protosam_tpu.models.sam.amg import remove_small_regions

    rng = np.random.default_rng(3)
    for trial in range(4):
        # blobby mask with holes and islands
        low = rng.random((12, 12))
        m = np.asarray(jax.image.resize(jnp.asarray(low), (96, 96),
                                        "linear")) > 0.55
        for mode in ("holes", "islands"):
            for thresh in (10, 60):
                want, w_changed = ref.remove_small_regions(
                    m.copy(), thresh, mode)
                got, g_changed = remove_small_regions(m.copy(), thresh, mode)
                assert g_changed == w_changed, (trial, mode, thresh)
                np.testing.assert_array_equal(
                    np.asarray(got, bool), np.asarray(want, bool),
                    err_msg=f"{trial} {mode} {thresh}")


def test_generate_crop_boxes_matches_reference():
    from protosam_tpu.models.sam.amg import generate_crop_boxes

    boxes, layers = generate_crop_boxes((600, 800), 2, 512 / 1500)
    # reference layout: 1 + 4 + 16 boxes
    assert len(boxes) == 21 and layers == [0] + [1] * 4 + [2] * 16
    assert boxes[0] == [0, 0, 800, 600]
    # layer-1 crops overlap: each crop longer than im/2
    assert boxes[1][2] - boxes[1][0] > 400
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 800 and 0 <= y0 < y1 <= 600


@pytest.fixture(scope="module")
def tiny_amg_env():
    from tests.reference_compat import build_tiny_torch_sam

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.utils.torch_convert import convert_sam

    sam = build_sam("vit_t", image_size=256)
    params = convert_sam(build_tiny_torch_sam().state_dict())
    rng = np.random.default_rng(5)
    img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    return sam, params, img


def _encode_full(sam, params, img):
    from protosam_tpu.models.sam.sam import preprocess
    from protosam_tpu.ops.resize import (
        longest_side_size,
        resize_bilinear_antialias,
    )

    h, w = img.shape[:2]
    nh, nw = longest_side_size(h, w, sam.image_size)
    x = jnp.asarray(img, jnp.float32)[None].transpose(0, 3, 1, 2)
    x = resize_bilinear_antialias(x, (nh, nw))
    x = preprocess(x.transpose(0, 2, 3, 1), sam.image_size)
    return sam.apply({"params": params}, x, method=sam.encode_image)


def test_amg_crop_layers_and_output_modes(tiny_amg_env):
    """crop_n_layers=1 sweeps 5 crops; all three output modes agree on the
    underlying masks; records carry the reference's full key set."""
    from protosam_tpu.models.sam.amg import SamAutomaticMaskGenerator
    from protosam_tpu.models.sam.rle import coco_decode_rle, rle_to_mask

    sam, params, img = tiny_amg_env
    emb = _encode_full(sam, params, img)

    kw = dict(points_per_side=6, pred_iou_thresh=-10.0,
              stability_score_thresh=-1.0, crop_n_layers=1,
              crop_n_points_downscale_factor=2)
    recs = {}
    for mode in ("binary_mask", "uncompressed_rle", "coco_rle"):
        amg = SamAutomaticMaskGenerator(sam, params, output_mode=mode, **kw)
        recs[mode] = amg.generate(emb, img.shape[:2], sam.image_size,
                                  image=img)
    assert len(recs["binary_mask"]) > 0
    assert len({len(v) for v in recs.values()}) == 1
    for rb, ru, rc in zip(recs["binary_mask"], recs["uncompressed_rle"],
                          recs["coco_rle"]):
        seg = rb["segmentation"]
        assert seg.shape == img.shape[:2] and seg.dtype == bool
        np.testing.assert_array_equal(rle_to_mask(ru["segmentation"]), seg)
        np.testing.assert_array_equal(
            rle_to_mask(coco_decode_rle(rc["segmentation"])), seg)
        for key in ("area", "predicted_iou", "stability_score", "bbox",
                    "point_coords", "crop_box"):
            assert key in rb, key
        assert rb["area"] == int(seg.sum())
        # some records must come from non-trivial crops
    crop_ws = {tuple(r["crop_box"]) for r in recs["binary_mask"]}
    assert len(crop_ws) > 1, "no masks surfaced from the crop layer"

    # crops require the image
    amg = SamAutomaticMaskGenerator(sam, params, crop_n_layers=1)
    with pytest.raises(ValueError):
        amg.generate(emb, img.shape[:2], sam.image_size)


def test_amg_min_mask_region_area(tiny_amg_env):
    """min_mask_region_area>0 fills small holes / drops small islands in
    the emitted masks."""
    from protosam_tpu.models.sam.amg import SamAutomaticMaskGenerator

    sam, params, img = tiny_amg_env
    emb = _encode_full(sam, params, img)
    kw = dict(points_per_side=4, pred_iou_thresh=-10.0,
              stability_score_thresh=-1.0)
    base = SamAutomaticMaskGenerator(sam, params, **kw).generate(
        emb, img.shape[:2], sam.image_size)
    post = SamAutomaticMaskGenerator(
        sam, params, min_mask_region_area=25, **kw).generate(
        emb, img.shape[:2], sam.image_size)
    assert base and post
    from protosam_tpu.models.sam.amg import remove_small_regions

    for rec in post:
        seg = rec["segmentation"]
        # idempotent: postprocessed masks have no small holes or islands
        s1, ch1 = remove_small_regions(seg, 25, "holes")
        s2, ch2 = remove_small_regions(s1, 25, "islands")
        assert not ch1 and not ch2
