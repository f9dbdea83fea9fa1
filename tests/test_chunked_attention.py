"""Chunked global attention must equal the full-matrix computation."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam.image_encoder import Attention, _rel_pos_table


def test_chunked_equals_full():
    b, h, w, c, heads = 2, 64, 32, 16, 2     # 2048 tokens -> chunked path
    m = Attention(num_heads=heads, use_rel_pos=True, q_chunk_rows=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    # non-trivial rel pos tables
    params = jax.tree.map(
        lambda a: a + 0.01 * np.random.default_rng(0).standard_normal(a.shape
                                                                      ).astype(a.dtype),
        params)
    got = m.apply({"params": params}, x)

    # reference: full attention with the same weights
    hd = c // heads
    qkv = x.reshape(b, -1, c) @ params["qkv"]["kernel"] + params["qkv"]["bias"]
    qkv = qkv.reshape(b, h * w, 3, heads, hd)
    q, k, v = jnp.moveaxis(qkv, 2, 0)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
    # the module stores tables padded to table_rows and slices 2*size-1
    Rh = _rel_pos_table(params["rel_pos_h"][:2 * h - 1], h, h)
    Rw = _rel_pos_table(params["rel_pos_w"][:2 * w - 1], w, w)
    rq = q.reshape(b, h, w, heads, hd)
    bh = jnp.einsum("bhwnc,hkc->bnhwk", rq, Rh)
    bw = jnp.einsum("bhwnc,wkc->bnhwk", rq, Rw)
    attn = (attn.reshape(b, heads, h, w, h, w) + bh[..., None]
            + bw[..., None, :]).reshape(b, heads, h * w, h * w)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h * w, c)
    want = out @ params["proj"]["kernel"] + params["proj"]["bias"]
    want = want.reshape(b, h, w, c)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bhsd_einsum_masking():
    """multi_head_attention_bhsd with n_valid must equal plain attention
    on the unpadded sequence (padded keys fully masked, padded queries
    discarded)."""
    from protosam_tpu.ops.attention import multi_head_attention_bhsd

    b, nh, s, d, pad = 1, 2, 24, 8, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)

    base = multi_head_attention_bhsd(q, k, v, scale=0.3, use_flash=False)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    padded = multi_head_attention_bhsd(qp, kp, vp, scale=0.3, n_valid=s,
                                       use_flash=False)
    np.testing.assert_allclose(np.asarray(padded[:, :, :s]),
                               np.asarray(base), atol=1e-6)


def test_masked_flash_kernel_matches_einsum():
    """The one-pass masked flash kernel (interpret) vs the einsum path,
    with and without key padding, at several query block sizes."""
    from protosam_tpu.ops.attention import (
        masked_flash_attention,
        multi_head_attention_bhsd,
    )

    b, nh, s, d = 2, 3, 256, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nh, s, d)), jnp.float32)

    for n_valid in (None, 200):
        want = np.asarray(multi_head_attention_bhsd(
            q, k, v, scale=0.25, n_valid=n_valid, use_flash=False))
        for blk in (64, 128, 256):
            got = np.asarray(masked_flash_attention(
                q, k, v, scale=0.25, n_valid=n_valid, blk_q=blk,
                interpret=True))
            if n_valid:
                got, ref = got[:, :, :n_valid], want[:, :, :n_valid]
            else:
                ref = want
            np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


import pytest


@pytest.mark.parametrize("nh", [2, 3, 4])
def test_packed_flash_kernel_matches_einsum(nh):
    """The packed-qkv kernel (interpret) must equal the einsum path fed the
    same fused projection output, with and without key padding (even head
    counts take the fori_loop two-heads-per-step path, odd the unrolled)."""
    from protosam_tpu.ops.attention import (
        masked_flash_attention_packed,
        multi_head_attention_bhsd,
    )

    b, s, hd = 2, 128, 16
    c = nh * hd
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)

    for n_valid in (None, 100):
        split = qkv.reshape(b, s, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        want = multi_head_attention_bhsd(split[0], split[1], split[2],
                                         scale=0.25, n_valid=n_valid,
                                         use_flash=False)
        want = np.asarray(want.transpose(0, 2, 1, 3).reshape(b, s, c))
        got = np.asarray(masked_flash_attention_packed(
            qkv, scale=0.25, num_heads=nh, n_valid=n_valid, interpret=True))
        nv = n_valid or s
        np.testing.assert_allclose(got[:, :nv], want[:, :nv],
                                   atol=2e-5, rtol=1e-4)


def test_packed_aug_matches_loop():
    """The augmented-operand kernel (mask/scale/row-sum folded into the MXU
    dots) vs the plain fori_loop kernel: the only numeric difference is the
    softmax row-sum's accumulation order (MXU tree vs VPU sequential), so
    outputs agree to ~1 ulp of the normalizer (scale is a power of two =>
    the q-side fold is exact)."""
    import os

    from protosam_tpu.ops.attention import masked_flash_attention_packed

    b, s, nh, hd = 2, 256, 4, 16
    rng = np.random.default_rng(11)
    for dt in (np.float32, jnp.bfloat16):
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * nh * hd)), dt)
        for n_valid in (None, 200):
            os.environ["PTPU_PACKED_AUG"] = "0"
            try:
                loop = masked_flash_attention_packed(
                    qkv, scale=0.25, num_heads=nh, n_valid=n_valid,
                    interpret=True)
            finally:
                os.environ.pop("PTPU_PACKED_AUG", None)
            pipe = masked_flash_attention_packed(
                qkv, scale=0.25, num_heads=nh, n_valid=n_valid,
                interpret=True)
            np.testing.assert_allclose(
                np.asarray(loop.astype(jnp.float32)),
                np.asarray(pipe.astype(jnp.float32)),
                atol=5e-7, rtol=2e-6)


def test_packed_head_grid_matches_loop():
    """The head-pair-per-program variant (grid over (batch, nh//2), constant
    qkv index map) must be bit-identical to the serial fori_loop kernel
    (PTPU_PACKED_AUG=0 pins the loop side to the baseline kernel — the aug
    kernel's MXU row-sum differs in accumulation order)."""
    import os

    from protosam_tpu.ops.attention import masked_flash_attention_packed

    b, s, nh, hd = 2, 256, 4, 16
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * nh * hd)), jnp.float32)
    for n_valid in (None, 200):
        os.environ["PTPU_PACKED_AUG"] = "0"
        try:
            loop = masked_flash_attention_packed(
                qkv, scale=0.25, num_heads=nh, n_valid=n_valid,
                interpret=True, head_grid=False)
        finally:
            os.environ.pop("PTPU_PACKED_AUG", None)
        grid = masked_flash_attention_packed(
            qkv, scale=0.25, num_heads=nh, n_valid=n_valid,
            interpret=True, head_grid=True)
        np.testing.assert_array_equal(np.asarray(loop), np.asarray(grid))


def test_packed_flash_gradient_matches_einsum():
    """The packed kernel's custom VJP (head-chunked einsum recomputation)
    must match gradients of the plain einsum path."""
    from protosam_tpu.ops.attention import (
        masked_flash_attention_packed,
        multi_head_attention_bhsd,
    )

    b, nh, s, hd = 1, 2, 64, 8
    c = nh * hd
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)

    def loss_packed(t):
        out = masked_flash_attention_packed(t, scale=0.3, num_heads=nh,
                                            n_valid=50, interpret=True)
        return jnp.sum(jnp.sin(out[:, :50]))

    def loss_ref(t):
        q5 = t.reshape(b, s, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        out = multi_head_attention_bhsd(q5[0], q5[1], q5[2], scale=0.3,
                                        n_valid=50, use_flash=False)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        return jnp.sum(jnp.sin(out[:, :50]))

    g1 = jax.grad(loss_packed)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-4)
