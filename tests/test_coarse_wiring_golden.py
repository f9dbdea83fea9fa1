"""Coarse-wiring golden: our FewShotSeg vs the reference's REAL FewShotSeg.

Both sides run the SAME tiny seeded DINOv2 encoder (HF Dinov2Model weights,
hub-faithful pos-embed interpolation — tests/reference_compat.py
build_tiny_hf_dino), so any disagreement is coarse WIRING — the feature
resize contract (resize-to-14-multiple, x_norm_patchtokens grid, min-32
upsample, reference grid_proto_fewshot.py:83-103), nearest mask downsample
(:228-231), the BG pass then per-shot FG passes with the data-dependent
``gridconv+`` -> ``mask`` fallback (:237-268), and the bilinear upsample of
the score map (:270-273).  This was the last untested seam in the ≥0.99
acceptance chain (VERDICT r2 missing #1): test_alp covers the ALP module,
test_dinov2_hf_parity the encoder, but nothing drove the reference's actual
``forward`` end to end.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_compat import (
    build_reference_fewshot,
    build_tiny_hf_dino,
    hub_dino_adapter,
    our_fewshot_params_from_hf,
)


def _dice(a, b):
    a = np.asarray(a) > 0
    b = np.asarray(b) > 0
    denom = a.sum() + b.sum()
    return 1.0 if denom == 0 else 2.0 * np.logical_and(a, b).sum() / denom


def _episode(image_size, blob, seed=0, tiny_mask=False):
    """Support/query images with a shared 'organ texture' so the random
    encoder's ALP matching produces a structured (non-noise) coarse pred:
    random projections preserve similarity, so query locations with the
    support-fg texture score high against the pooled prototypes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size]

    def blobby(cy, cx, r):
        return np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2.0 * r * r)))

    scy, scx, sr = blob
    sup_blob = blobby(scy, scx, sr)
    qry_blob = blobby(scy + image_size // 8, scx - image_size // 10,
                      max(sr - 2, 3))
    texture = np.sin(yy / 3.0) * np.cos(xx / 2.5)
    sup = np.stack([sup_blob * 2.0 + texture * sup_blob,
                    sup_blob - texture,
                    0.5 * sup_blob]).astype(np.float32)
    qry = np.stack([qry_blob * 2.0 + texture * qry_blob,
                    qry_blob - texture,
                    0.5 * qry_blob]).astype(np.float32)
    sup += 0.05 * rng.standard_normal(sup.shape).astype(np.float32)
    qry += 0.05 * rng.standard_normal(qry.shape).astype(np.float32)
    if tiny_mask:
        # a mask too small for any pooled window to reach the 0.95 purity
        # threshold -> the reference's FG pass falls back to 'mask' mode
        fg = ((np.abs(yy - scy) <= 1) & (np.abs(xx - scx) <= 1))
    else:
        fg = sup_blob > 0.45
    return (sup[None], fg[None].astype(np.float32), qry[None])


@pytest.fixture(scope="module")
def pair():
    hf = build_tiny_hf_dino()
    return hf, our_fewshot_params_from_hf(hf)


def _run_both(pair, image_size, tiny_mask, seed=0):
    hf, our_params = pair
    sup, fg, qry = _episode(image_size, (image_size // 3,) * 2 + (9,),
                            seed=seed, tiny_mask=tiny_mask)

    ref = build_reference_fewshot(image_size, hub_dino_adapter(hf))
    with torch.no_grad():
        out = ref(
            [[torch.from_numpy(sup)]], [[torch.from_numpy(fg)]],
            [[torch.from_numpy(1.0 - fg)]], [torch.from_numpy(qry)],
            isval=True, val_wsize=2)
    want = np.asarray(out[0])                      # (1, 2, H, W)

    from protosam_tpu.models.alpnet import FewShotSeg

    ours = FewShotSeg(image_size=image_size, which_model="dinov2_t14")
    got = ours.apply({"params": our_params}, jnp.asarray(sup),
                     jnp.asarray(fg), jnp.asarray(1.0 - fg),
                     jnp.asarray(qry), isval=True, val_wsize=2)
    return want, np.asarray(got["logits"])


def test_min32_upsample_grid(pair):
    """126² input: 9² token grid -> min-32 upsample branch
    (grid_proto_fewshot.py:96-98) + interpolated pos-embed."""
    want, got = _run_both(pair, 126, tiny_mask=False)
    assert want.shape == got.shape == (1, 2, 126, 126)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    d = _dice(got.argmax(1), want.argmax(1))
    assert d >= 0.99, f"coarse mask dice {d}"
    assert (want.argmax(1) > 0).sum() > 20  # structured, non-empty pred


def test_native_grid_no_upsample(pair):
    """476² input: 34² grid (> 32) skips the upsample; also exercises the
    resize-to-14-multiple no-op (476 = 34*14)."""
    want, got = _run_both(pair, 476, tiny_mask=False, seed=1)
    assert want.shape == got.shape == (1, 2, 476, 476)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    d = _dice(got.argmax(1), want.argmax(1))
    assert d >= 0.99, f"coarse mask dice {d}"


def test_fg_fallback_to_mask_mode(pair):
    """A support mask below the pooled 0.95 purity threshold triggers the
    reference's data-dependent FG fallback (grid_proto_fewshot.py:254-256);
    ours must take the same branch (lax.cond) and agree."""
    import torch.nn.functional as F

    hf, _ = pair
    image_size = 126
    sup, fg, qry = _episode(image_size, (42, 42, 9), tiny_mask=True)
    # confirm the case really is below threshold at feature resolution
    res_fg = F.interpolate(torch.from_numpy(fg)[None], size=(32, 32),
                           mode="nearest")
    assert float(F.avg_pool2d(res_fg, 4).max()) < 0.95
    want, got = _run_both(pair, image_size, tiny_mask=True)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_precomputed_supp_fts_path(pair):
    """Our pipeline precomputes support features once per volume (a TPU
    optimization — one support encode per volume instead of per slice); the
    short-circuit must be EQUIVALENT to the joint-encode path, and the joint
    path is the reference golden.

    The reference's own supp_fts branch is dead code: its driver initializes
    ``supp_fts = None`` and never assigns it (validation_protosam.py:338),
    and the branch itself mis-views the concatenated support+query features
    as query-only (grid_proto_fewshot.py:181-196 — it would double the
    channel dim); so parity is asserted against the reference's JOINT
    forward, which is what its runtime actually executes per slice."""
    hf, our_params = pair
    image_size = 126
    sup, fg, qry = _episode(image_size, (42, 42, 9))

    ref = build_reference_fewshot(image_size, hub_dino_adapter(hf))
    with torch.no_grad():
        joint = ref([[torch.from_numpy(sup)]], [[torch.from_numpy(fg)]],
                    [[torch.from_numpy(1.0 - fg)]], [torch.from_numpy(qry)],
                    isval=True, val_wsize=2)
    want = np.asarray(joint[0])

    from protosam_tpu.models.alpnet import FewShotSeg

    ours = FewShotSeg(image_size=image_size, which_model="dinov2_t14")
    ours_joint = ours.apply({"params": our_params}, jnp.asarray(sup),
                            jnp.asarray(fg), jnp.asarray(1.0 - fg),
                            jnp.asarray(qry), isval=True, val_wsize=2)
    got = ours.apply({"params": our_params}, jnp.asarray(sup),
                     jnp.asarray(fg), jnp.asarray(1.0 - fg),
                     jnp.asarray(qry), isval=True, val_wsize=2,
                     supp_fts=ours_joint["supp_fts"])
    # short-circuit == our joint path (exact: same encode of the support)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ours_joint["logits"]),
                               atol=1e-5, rtol=1e-5)
    # and == the reference's joint forward
    np.testing.assert_allclose(np.asarray(got["logits"]), want,
                               atol=2e-3, rtol=1e-3)
