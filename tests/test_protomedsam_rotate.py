"""ProtoMedSAM pipeline + rotation TTA smoke tests (tiny models, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.io_protocol import ALPNetInput
from protosam_tpu.models.sam import build_sam
from protosam_tpu.ops.rotate import reverse_tensor, rotate_tensor_no_crop
from protosam_tpu.pipeline import ProtoMedSAM, ProtoSAM, ProtoSAMConfig


@pytest.fixture(scope="module")
def tiny():
    rng = jax.random.PRNGKey(0)
    coarse = FewShotSeg(image_size=126, which_model="dinov2_t14")
    sam = build_sam("vit_t", image_size=256)
    supp = jax.random.normal(rng, (1, 3, 126, 126))
    qry = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 126, 126))
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    cp = coarse.init(rng, supp, fg, 1 - fg, qry)["params"]
    sp = sam.init(rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
                  jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    return coarse, cp, sam, sp, supp, fg, qry


def test_protomedsam_end_to_end(tiny):
    coarse, cp, sam, sp, supp, fg, qry = tiny
    cfg = ProtoSAMConfig(image_size=(256, 256), use_points=False,
                         use_bbox=True, use_cca=True, max_ccs=4)
    pipe = ProtoMedSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput(supp, fg, qry)
    pred, scores = pipe.forward(qry, inp)
    assert pred.shape == (126, 126)
    assert set(np.unique(np.asarray(pred))) <= {0.0, 1.0}


def test_protomedsam_segment_all(tiny):
    coarse, cp, sam, sp, supp, fg, qry = tiny
    pipe = ProtoMedSAM(coarse, cp, sam, sp,
                       ProtoSAMConfig(image_size=(256, 256), use_points=False,
                                      use_bbox=True, max_ccs=4))
    gt = np.zeros((126, 126), np.uint8)
    gt[40:80, 40:80] = 1
    mask, scores = pipe.segment_all(qry, gt)
    assert mask.shape == (126, 126)


def test_rotate_roundtrip():
    x = jnp.zeros((1, 3, 64, 64)).at[:, :, 20:40, 25:45].set(1.0)
    rot, (rh, rw) = rotate_tensor_no_crop(x, 15)
    assert rot.shape == x.shape
    back = reverse_tensor(rot, int(rh), int(rw), -15)
    # the reference's crop leaves an off-by-one on odd expansion diffs;
    # compare on the shared region
    hh = min(back.shape[-2], 64)
    ww = min(back.shape[-1], 64)
    assert abs(back.shape[-2] - 64) <= 1 and abs(back.shape[-1] - 64) <= 1
    b0 = np.asarray(back[0, 0, :hh, :ww]) > 0.5
    x0 = np.asarray(x[0, 0, :hh, :ww]) > 0.5
    inter = (b0 & x0).sum()
    union = (b0 | x0).sum()
    assert inter / union > 0.7


def test_protosam_rotation_tta(tiny):
    coarse, cp, sam, sp, supp, fg, qry = tiny
    cfg = ProtoSAMConfig(image_size=(256, 256), use_cca=True, max_ccs=4)
    pipe = ProtoSAM(coarse, cp, sam, sp, cfg)
    inp = ALPNetInput(supp, fg, qry)
    pred, scores = pipe.forward(qry, inp, degrees_rotate=15)
    assert pred.shape == (126, 126)
    assert np.isfinite(np.asarray(scores)).all()
