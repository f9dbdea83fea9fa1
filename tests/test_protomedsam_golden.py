"""ProtoMedSAM golden test: our jitted box-prompt pipeline vs the reference's
torch ProtoMedSAM.forward on identical inputs and weights.

Same harness shape as test_pipeline_golden: both sides consume the SAME
coarse logits through a stub coarse model and the SAME tiny seeded SAM
weights, so any disagreement is a wiring divergence in the MedSAM stage —
the need_softmax heuristic, CCA/bbox extraction, the [0, 1] min-max input
norm (no pixel-stats), box scaling into the SAM frame, batched
prompt-encode/decode, sigmoid > 0.5, nearest resize back (reference
models/ProtoMedSAM.py:122-222, medsam_inference :31-65).

Acceptance: final masks >= 0.99 Dice (BASELINE.json).
"""

import importlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_compat import (
    StubCoarseModel as _StubCoarse,
    StubSegmentationInput as _StubInput,
    build_tiny_torch_sam as _build_torch_sam,
    import_reference_protosam,
    synthetic_coarse_logits as _coarse_logits,
)


def _dice(a, b):
    a = np.asarray(a) > 0
    b = np.asarray(b) > 0
    denom = a.sum() + b.sum()
    return 1.0 if denom == 0 else 2.0 * np.logical_and(a, b).sum() / denom


@pytest.fixture(scope="module")
def pair():
    """(reference ProtoMedSAM module, torch SAM, our SAM, our params)."""
    import_reference_protosam()  # installs the stub environment
    PM = importlib.import_module("models.ProtoMedSAM")
    torch_sam = _build_torch_sam()

    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.utils.torch_convert import convert_sam

    our_sam = build_sam("vit_t", image_size=256)
    our_params = convert_sam(torch_sam.state_dict())
    return PM, torch_sam, our_sam, our_params


def _run_pair(pair, use_cca, blobs, seed=0, hw=256):
    PM, torch_sam, our_sam, our_params = pair
    rng = np.random.default_rng(seed)
    logits = _coarse_logits(rng, hw, hw, blobs)
    qry = rng.standard_normal((1, 3, hw, hw)).astype(np.float32)

    # ---- reference torch pipeline --------------------------------------
    # route get_sam's registry lookup to the prebuilt seeded tiny MedSAM
    PM.sam_model_registry = {"vit_b": lambda checkpoint=None: torch_sam}
    ref = PM.ProtoMedSAM((256, 256), _StubCoarse(torch.from_numpy(logits)),
                         sam_pretrained_path="unused_vit_b.pth",
                         use_cca=use_cca)
    ref.eval()
    with torch.no_grad():
        want_pred, want_conf = ref.forward(torch.from_numpy(qry),
                                           _StubInput(), degrees_rotate=0)
    want_pred = np.asarray(want_pred)

    # ---- our jitted pipeline -------------------------------------------
    from protosam_tpu.pipeline import ProtoMedSAM as OurProtoMedSAM
    from protosam_tpu.pipeline import ProtoSAMConfig

    pipe = OurProtoMedSAM(None, None, our_sam, our_params,
                          ProtoSAMConfig(image_size=(256, 256), max_ccs=8,
                                         use_points=False, use_bbox=True,
                                         use_cca=use_cca))
    got_pred, got_scores, _ = pipe._jit_refine(our_params, jnp.asarray(qry),
                                               jnp.asarray(logits))
    return want_pred, want_conf, np.asarray(got_pred), np.asarray(got_scores)


def test_protomedsam_cca_golden(pair):
    """The flagship MedSAM eval config (use_cca keeps the best component):
    masks must agree >= 0.99 Dice with the reference forward."""
    blobs = [(90, 90, 27, 5.0), (180, 175, 18, 4.0)]
    want, want_conf, got, got_scores = _run_pair(pair, True, blobs, hw=256)
    assert want.shape == got.shape == (256, 256)
    assert want.max() > 0, "reference produced an empty mask (bad fixture)"
    d = _dice(want, got)
    assert d >= 0.99, f"mask dice {d}"
    # the reference returns the decoder's raw IoU head output as conf
    np.testing.assert_allclose(np.ravel(got_scores)[0],
                               float(np.asarray(want_conf).reshape(-1)[0]),
                               atol=5e-3)


def test_protomedsam_multi_component_golden(pair):
    """use_cca=False: the reference decodes one box per connected component
    in one batched medsam_inference call; masks are combined."""
    blobs = [(75, 75, 24, 5.0), (180, 180, 18, 4.5), (90, 186, 15, 4.0)]
    want, want_conf, got, got_scores = _run_pair(pair, False, blobs, seed=1,
                                                 hw=256)
    d = _dice(want, got)
    assert d >= 0.99, f"mask dice {d}"
    conf = np.asarray(want_conf).reshape(-1)
    assert conf.shape[0] >= 3  # all three seeded blobs surfaced
    n = min(conf.shape[0], 8)
    np.testing.assert_allclose(np.ravel(got_scores)[:n], conf[:n], atol=5e-3)


def test_protomedsam_empty_pred_golden(pair):
    """Empty coarse pred: the reference returns the coarse argmax and conf
    [0] (reference :227-230)."""
    want, want_conf, got, _ = _run_pair(pair, True, [], seed=2, hw=256)
    assert want.max() == 0 and got.max() == 0
    assert [float(c) for c in np.atleast_1d(want_conf)] == [0.0]
