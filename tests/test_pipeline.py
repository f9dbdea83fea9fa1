"""End-to-end ProtoSAM pipeline smoke tests (tiny models, CPU)."""

import numpy as np
import jax
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.io_protocol import ALPNetInput, InputFactory, TYPE_ALPNET
from protosam_tpu.models.sam import build_sam
from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig


@pytest.fixture(scope="module")
def tiny_pipeline():
    rng = jax.random.PRNGKey(0)
    coarse = FewShotSeg(image_size=126, which_model="dinov2_t14")
    sam = build_sam("vit_t", image_size=256)

    supp = jax.random.normal(rng, (1, 3, 126, 126))
    qry = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 126, 126))
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    coarse_params = coarse.init(rng, supp, fg, 1 - fg, qry)["params"]
    sam_params = sam.init(
        rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
        jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    return coarse, coarse_params, sam, sam_params, supp, fg, qry


@pytest.mark.parametrize("use_cca", [True, False])
def test_pipeline_end_to_end(tiny_pipeline, use_cca):
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), use_cca=use_cca, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput([[supp]], [[fg]], qry, isval=True, val_wsize=2)
    pred, scores = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)
    # cca mode decodes only the single kept component
    assert scores.shape == ((1,) if use_cca else (4,))
    assert set(np.unique(np.asarray(pred))) <= {0.0, 1.0}
    assert np.isfinite(np.asarray(scores)).all()


def test_pipeline_coarse_only(tiny_pipeline):
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), coarse_pred_only=True,
                         use_cca=True, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput([[supp]], [[fg]], qry)
    pred, conf = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)
    assert conf.shape == (1,)


def test_input_factory_matches_reference_protocol(tiny_pipeline):
    _, _, _, _, supp, fg, qry = tiny_pipeline
    inp = InputFactory.create_input(TYPE_ALPNET, qry, support_images=[[supp]],
                                    support_labels=[[fg]], isval=True,
                                    val_wsize=2)
    assert isinstance(inp, ALPNetInput)
    assert inp.supp_imgs.shape == (1, 3, 126, 126)
    assert inp.back_mask.shape == (1, 126, 126)
    np.testing.assert_array_equal(np.asarray(inp.back_mask),
                                  1 - np.asarray(fg))


def test_pipeline_empty_coarse_pred(tiny_pipeline):
    """A query whose coarse pred is empty must return zeros + score 0
    (reference ProtoSAM.py:612-613)."""
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), use_cca=True, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)

    # force an empty prediction by using an all-background support mask: the
    # FG pass falls back to 'mask' mode with a zero prototype; BG wins.
    zeros_fg = jnp.zeros_like(fg)
    inp = ALPNetInput([[supp]], [[zeros_fg]], qry)
    pred, scores = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)


def test_pipeline_mask_prompts(tiny_pipeline):
    """use_mask mode: 256² mask prompts, multimask, best-score selection."""
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), use_points=False,
                         use_bbox=False, use_mask=True, use_cca=True,
                         max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput([[supp]], [[fg]], qry)
    pred, scores = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)
    assert np.isfinite(np.asarray(scores)).all()


def test_forward_volume_equals_single(tiny_pipeline):
    """The batched volume program must reproduce single-slice forward."""
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), use_cca=True, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    queries = jnp.concatenate(
        [qry, jax.random.normal(jax.random.PRNGKey(7), (2, 3, 126, 126))],
        axis=0)
    inp = ALPNetInput([[supp]], [[fg]], qry)
    preds, scores = pipe.forward_volume(queries, inp, slice_batch=3)
    for i in range(3):
        p1, s1 = pipe.forward(queries[i:i + 1], inp)
        np.testing.assert_allclose(np.asarray(preds[i]), np.asarray(p1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores[i]), np.asarray(s1),
                                   atol=1e-4, rtol=1e-4)


def test_pipeline_multi_point_no_cca(tiny_pipeline):
    """num_points_for_sam=3, conf mode, cca off, neg points on: the widest
    prompt configuration."""
    coarse, cp, sam, sp, supp, fg, qry = tiny_pipeline
    cfg = ProtoSAMConfig(image_size=(256, 256), use_cca=False,
                         num_points_for_sam=3, point_mode="conf",
                         use_neg_points=True, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput([[supp]], [[fg]], qry)
    pred, scores = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)
    assert scores.shape == (4,)
    assert np.isfinite(np.asarray(pred)).all()
