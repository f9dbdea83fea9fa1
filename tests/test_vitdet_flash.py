"""ViTDet flash attention with decomposed rel-pos vs the einsum reference
(interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam.image_encoder import _rel_pos_table
from protosam_tpu.ops.vitdet_flash import flash_attention_relpos


def reference(q, k, v, Rh, Rw, h, w, scale):
    b, s, nh, d = q.shape
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    rq = q.reshape(b, h, w, nh, d)
    bh = jnp.einsum("bhwnc,hkc->bnhwk", rq, Rh)
    bw = jnp.einsum("bhwnc,wkc->bnhwk", rq, Rw)
    attn = (attn.reshape(b, nh, h, w, h, w) + bh[..., None]
            + bw[..., None, :]).reshape(b, nh, s, s)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def test_matches_einsum_reference(rng):
    b, h, w, nh, d = 2, 8, 8, 2, 16
    s = h * w
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((2 * h - 1, d)) * 0.1, jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((2 * w - 1, d)) * 0.1, jnp.float32)
    Rh = _rel_pos_table(rel_h, h, h)
    Rw = _rel_pos_table(rel_w, w, w)

    want = np.asarray(reference(q, k, v, Rh, Rw, h, w, scale))
    got = np.asarray(flash_attention_relpos(q, k, v, Rh, Rw, (h, w), scale,
                                            rows_per_blk=2, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_block_size_invariance(rng):
    b, h, w, nh, d = 1, 8, 4, 1, 8
    s = h * w
    q = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((h, h, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((w, w, d)) * 0.1, jnp.float32)
    a = np.asarray(flash_attention_relpos(q, k, v, Rh, Rw, (h, w), 0.3,
                                          rows_per_blk=2, interpret=True))
    bb = np.asarray(flash_attention_relpos(q, k, v, Rh, Rw, (h, w), 0.3,
                                           rows_per_blk=4, interpret=True))
    np.testing.assert_allclose(a, bb, atol=1e-5)


def test_encoder_flash_matches_chunked(rng, monkeypatch):
    """The flag must not change encoder outputs.  The CPU lowering of
    platform_dependent would silently route BOTH encoders to the chunked
    branch, so force the flash closure (in interpret mode) for the
    use_flash_relpos encoder — this genuinely exercises the Pallas kernel
    inside the encoder wiring."""
    import protosam_tpu.ops.vitdet_flash as vf
    from protosam_tpu.models.sam.image_encoder import ImageEncoderViT

    orig = vf.flash_attention_relpos
    monkeypatch.setattr(
        vf, "flash_attention_relpos",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    orig_w = vf.window_flash_attention
    monkeypatch.setattr(
        vf, "window_flash_attention",
        lambda *a, **k: orig_w(*a, **{**k, "interpret": True}))
    orig_p = vf.window_packed_attention
    monkeypatch.setattr(
        vf, "window_packed_attention",
        lambda *a, **k: orig_p(*a, **{**k, "interpret": True}))
    orig_g = vf.global_packed_attention
    monkeypatch.setattr(
        vf, "global_packed_attention",
        lambda *a, **k: orig_g(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        jax.lax, "platform_dependent",
        lambda *args, default=None, **branches: default(*args))

    kw = dict(img_size=8 * 64, patch_size=8, embed_dim=32, depth=1,
              num_heads=2, out_chans=16, use_rel_pos=True, window_size=14,
              global_attn_indexes=(0,))
    base = ImageEncoderViT(**kw)
    flash = ImageEncoderViT(use_flash_relpos=True, **kw)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)) * 0.1, jnp.float32)
    p = base.init(jax.random.PRNGKey(0), x)["params"]
    p = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(1).standard_normal(
            a.shape).astype(np.float32), p)
    a = np.asarray(base.apply({"params": p}, x))
    b = np.asarray(flash.apply({"params": p}, x))
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4)


def test_window_kernel_matches_einsum_reference(rng):
    from protosam_tpu.ops.vitdet_flash import window_flash_attention

    win, nw, nh, d = 4, 3, 2, 16
    s = win * win
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)

    want = reference(q, k, v, Rh, Rw, win, win, scale)
    got = np.asarray(window_flash_attention(q, k, v, Rh, Rw, win, scale,
                                            interpret=True))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_window_kernel_14(rng):
    """Production window size (14² = 196 tokens, non-power-of-two)."""
    from protosam_tpu.ops.vitdet_flash import window_flash_attention

    win, nw, nh, d = 14, 2, 2, 8
    s = win * win
    q = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)

    want = reference(q, k, v, Rh, Rw, win, win, 0.3)
    got = np.asarray(window_flash_attention(q, k, v, Rh, Rw, win, 0.3,
                                            interpret=True))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_window_kernel_vith_head_dim(rng):
    """ViT-H head geometry: head_dim 80 (non-lane-aligned)."""
    from protosam_tpu.ops.vitdet_flash import window_flash_attention

    win, nw, nh, d = 4, 2, 2, 80
    s = win * win
    q = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)

    want = reference(q, k, v, Rh, Rw, win, win, 0.2)
    got = np.asarray(window_flash_attention(q, k, v, Rh, Rw, win, 0.2,
                                            interpret=True))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_heads_first_layout_equivalence(rng):
    """heads_first=True must equal the (B, S, heads, D) layout exactly."""
    from protosam_tpu.ops.vitdet_flash import (
        flash_attention_relpos,
        window_flash_attention,
    )

    b, h, w, nh, d = 1, 8, 8, 2, 16
    s = h * w
    q = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((h, h, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((w, w, d)) * 0.1, jnp.float32)

    base = flash_attention_relpos(q, k, v, Rh, Rw, (h, w), 0.25,
                                  rows_per_blk=2, interpret=True)
    hf = flash_attention_relpos(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), Rh, Rw, (h, w), 0.25, rows_per_blk=2,
        interpret=True, heads_first=True)
    np.testing.assert_array_equal(np.asarray(base),
                                  np.asarray(hf.transpose(0, 2, 1, 3)))

    basew = window_flash_attention(q, k, v, Rh, Rw, h, 0.25, interpret=True)
    hfw = window_flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), Rh, Rw, h, 0.25, interpret=True,
        heads_first=True)
    np.testing.assert_array_equal(np.asarray(basew),
                                  np.asarray(hfw.transpose(0, 2, 1, 3)))


def test_window_variants_match(rng):
    """wpp>1 (multi-window programs) and the XLA-aug (no-pallas) backend
    must match the per-window kernel exactly / to fp tolerance."""
    from protosam_tpu.ops.vitdet_flash import (
        window_attention_xla_aug,
        window_flash_attention,
    )

    win, nw, nh, d = 4, 6, 2, 16
    s = win * win
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nw, s, nh, d)), jnp.float32)
    Rh = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng.standard_normal((win, win, d)) * 0.1, jnp.float32)

    want = np.asarray(reference(q, k, v, Rh, Rw, win, win, scale))
    for wpp in (2, 3, 6):
        got = np.asarray(window_flash_attention(
            q, k, v, Rh, Rw, win, scale, interpret=True, wpp=wpp))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    got = np.asarray(window_attention_xla_aug(q, k, v, Rh, Rw, win, scale))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # heads-first layout round-trips identically
    qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    got_hf = np.asarray(window_attention_xla_aug(
        qh, kh, vh, Rh, Rw, win, scale, heads_first=True))
    np.testing.assert_allclose(got_hf.transpose(0, 2, 1, 3), want,
                               atol=2e-5, rtol=1e-4)


def test_window_packed_matches_reference(rng):
    """The packed (BlockSpec-partition) window kernel vs the einsum
    reference on bias-padded inputs, including a non-multiple grid where
    edge windows contain pad tokens carrying the projection bias."""
    from protosam_tpu.ops.vitdet_flash import window_packed_attention

    win, nh, d = 4, 2, 16
    c = nh * d
    b, h, w = 2, 10, 6            # pads to 12 x 8: edge windows present
    scale = d ** -0.5
    rng_ = np.random.default_rng(3)
    qkv = jnp.asarray(rng_.standard_normal((b, h, w, 3 * c)), jnp.float32)
    bias_vec = jnp.asarray(rng_.standard_normal((3 * c,)) * 0.1, jnp.float32)
    Rh = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.float32)

    # bias-pad qkv, zero-pad bias factors (as the encoder does)
    ph, pw = (-h) % win, (-w) % win
    hp, wp = h + ph, w + pw
    qkv_pad = jnp.pad(qkv, ((0, 0), (0, ph), (0, pw), (0, 0)))
    valid = ((jnp.arange(hp) < h)[:, None]
             & (jnp.arange(wp) < w)[None, :])[None, :, :, None]
    qkv_pad = jnp.where(valid, qkv_pad, bias_vec)

    q_all = qkv[..., :c].reshape(b, h, w, nh, d)
    iy, ix = np.arange(h) % win, np.arange(w) % win
    bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all, Rh[iy])
    bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all, Rw[ix])
    bias = jnp.concatenate([bias_h, bias_w], -1).reshape(b, h, w, nh * 2 * win)
    bias = jnp.pad(bias, ((0, 0), (0, ph), (0, pw), (0, 0)))

    got = np.asarray(window_packed_attention(
        qkv_pad, bias, win, nh, scale, interpret=True))[:, :h, :w]
    # wcp=2 (multi-window programs; wp=8 -> nwx=2) must be bit-identical
    got_wcp = np.asarray(window_packed_attention(
        qkv_pad, bias, win, nh, scale, interpret=True, wcp=2))[:, :h, :w]
    np.testing.assert_array_equal(got, got_wcp)
    # flat 4-D variant (no 6-D reshape) must be bit-identical too
    got_flat = np.asarray(window_packed_attention(
        qkv_pad, bias, win, nh, scale, interpret=True,
        flat=True))[:, :h, :w]
    np.testing.assert_array_equal(got, got_flat)

    # reference: partition the SAME bias-padded qkv, einsum per window
    from protosam_tpu.models.sam.image_encoder import (
        window_partition,
        window_unpartition,
    )
    ww, _ = window_partition(qkv_pad, win)
    nw = ww.shape[0]
    q5 = ww.reshape(nw, win * win, 3, nh, d).transpose(2, 0, 1, 3, 4)
    want = reference(q5[0], q5[1], q5[2], Rh, Rw, win, win, scale)
    want = window_unpartition(
        np.asarray(want).reshape(nw, win, win, c), win, (hp, wp), (h, w))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_window_flat_bf16_production_win(rng):
    """The flat window kernel with bf16 operands at the production win=14
    geometry (the base test runs win=4 f32 only) against the f32 einsum
    reference at bf16 tolerance."""
    from protosam_tpu.ops.vitdet_flash import window_packed_attention

    win, nh, d, tol = 14, 2, 64, 3e-2
    c = nh * d
    b = 1
    hp = wp = 2 * win
    scale = d ** -0.5
    rng_ = np.random.default_rng(win)
    qkv = jnp.asarray(rng_.standard_normal((b, hp, wp, 3 * c)), jnp.bfloat16)
    Rh = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.bfloat16)
    Rw = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.bfloat16)
    q_all = qkv[..., :c].reshape(b, hp, wp, nh, d)
    iy, ix = np.arange(hp) % win, np.arange(wp) % win
    bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all, Rh[iy])
    bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all, Rw[ix])
    bias = jnp.concatenate([bias_h, bias_w], -1).reshape(
        b, hp, wp, nh * 2 * win).astype(jnp.bfloat16)
    got = np.asarray(window_packed_attention(
        qkv, bias, win, nh, scale, interpret=True,
        flat=True).astype(jnp.float32))

    from protosam_tpu.models.sam.image_encoder import (
        window_partition,
        window_unpartition,
    )
    ww, _ = window_partition(qkv.astype(jnp.float32), win)
    nw = ww.shape[0]
    q5 = ww.reshape(nw, win * win, 3, nh, d).transpose(2, 0, 1, 3, 4)
    want = reference(q5[0], q5[1], q5[2], Rh.astype(jnp.float32),
                     Rw.astype(jnp.float32), win, win, scale)
    want = window_unpartition(
        np.asarray(want).reshape(nw, win, win, c), win, (hp, wp), (hp, wp))
    np.testing.assert_allclose(got, np.asarray(want), atol=tol, rtol=tol)


def test_packed_kernels_vith_head_dim(rng):
    """ViT-H head geometry (head_dim 80, non-lane-aligned) through BOTH
    packed kernels: the in-kernel static lane slices at stride 80 and the
    BlockSpec lane-block indexing must stay exact off 128 multiples."""
    from protosam_tpu.ops.vitdet_flash import (
        global_packed_attention,
        window_packed_attention,
    )

    nh, d = 2, 80
    c = nh * d
    rng_ = np.random.default_rng(7)

    # window kernel, exact grid (no pad windows)
    win = 4
    b, h, w = 1, 8, 8
    scale = d ** -0.5
    qkv = jnp.asarray(rng_.standard_normal((b, h, w, 3 * c)), jnp.float32)
    Rh = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng_.standard_normal((win, win, d)) * 0.1, jnp.float32)
    q_all = qkv[..., :c].reshape(b, h, w, nh, d)
    iy, ix = np.arange(h) % win, np.arange(w) % win
    bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all, Rh[iy])
    bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all, Rw[ix])
    bias = jnp.concatenate([bias_h, bias_w], -1).reshape(b, h, w, nh * 2 * win)
    got = np.asarray(window_packed_attention(
        qkv, bias, win, nh, scale, interpret=True))
    from protosam_tpu.models.sam.image_encoder import (
        window_partition,
        window_unpartition,
    )
    ww, _ = window_partition(qkv, win)
    nw = ww.shape[0]
    q5 = ww.reshape(nw, win * win, 3, nh, d).transpose(2, 0, 1, 3, 4)
    want = reference(q5[0], q5[1], q5[2], Rh, Rw, win, win, scale)
    want = window_unpartition(
        np.asarray(want).reshape(nw, win, win, c), win, (h, w), (h, w))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)

    # global kernel on the same projection
    s = h * w
    Rhg = jnp.asarray(rng_.standard_normal((h, h, d)) * 0.1, jnp.float32)
    Rwg = jnp.asarray(rng_.standard_normal((w, w, d)) * 0.1, jnp.float32)
    bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all, Rhg)
    bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all, Rwg)
    biasg = jnp.concatenate([bias_h, bias_w], -1).reshape(
        b, h, w, nh * (h + w))
    got = np.asarray(global_packed_attention(
        qkv, biasg, nh, scale, rows_per_blk=4, interpret=True))
    q5 = qkv.reshape(b, s, 3, nh, d).transpose(2, 0, 1, 3, 4)
    want = np.asarray(reference(q5[0], q5[1], q5[2], Rhg, Rwg, h, w, scale))
    np.testing.assert_allclose(got.reshape(b, s, c), want.reshape(b, s, c),
                               atol=2e-5, rtol=1e-4)


def test_global_packed_matches_reference(rng):
    """The packed global kernel (lane-block head slicing + scratch k_aug)
    vs the einsum reference."""
    from protosam_tpu.ops.vitdet_flash import global_packed_attention

    b, h, w, nh, d = 2, 8, 8, 2, 16
    c = nh * d
    s = h * w
    scale = d ** -0.5
    rng_ = np.random.default_rng(4)
    qkv = jnp.asarray(rng_.standard_normal((b, h, w, 3 * c)), jnp.float32)
    Rh = jnp.asarray(rng_.standard_normal((h, h, d)) * 0.1, jnp.float32)
    Rw = jnp.asarray(rng_.standard_normal((w, w, d)) * 0.1, jnp.float32)

    q_all = qkv[..., :c].reshape(b, h, w, nh, d)
    bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all, Rh)
    bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all, Rw)
    bias = jnp.concatenate([bias_h, bias_w], -1).reshape(b, h, w, nh * (h + w))

    for rows in (2, 4, 8):
        got = np.asarray(global_packed_attention(
            qkv, bias, nh, scale, rows_per_blk=rows, interpret=True))

        q5 = qkv.reshape(b, s, 3, nh, d).transpose(2, 0, 1, 3, 4)
        want = np.asarray(reference(q5[0], q5[1], q5[2], Rh, Rw, h, w, scale))
        np.testing.assert_allclose(got.reshape(b, s, c),
                                   want.reshape(b, s, c),
                                   atol=2e-5, rtol=1e-4)
