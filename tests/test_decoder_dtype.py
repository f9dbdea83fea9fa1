"""The selective-f32 decode tail (PARITY.md bf16 drift reconciliation).

Production bf16 builds keep the prompt encoder + mask decoder in f32
(registry default ``decoder_dtype=float32``): the decode logits are
thresholded at 0, so bf16 rounding there flips mask-boundary pixels — the
dominant term of the measured bf16-vs-f32 drift.  These tests pin:

* registry builds carry the f32 decode tail under a bf16 encoder,
* the bf16 build's decode outputs are f32 and agree with the all-f32
  build's decode bit-for-bit when fed the same (f32) embedding,
* explicit ``decoder_dtype`` overrides still work (all-bf16 opt-out).
"""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam import build_sam


def _tiny_params(sam):
    return sam.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, sam.image_size, sam.image_size, 3)),
                    jnp.zeros((1, 2, 2)), jnp.ones((1, 2), jnp.int32),
                    jnp.zeros((1, 4)))["params"]


def test_registry_defaults_f32_decode_tail():
    sam = build_sam("vit_t", dtype=jnp.bfloat16, image_size=256)
    assert sam.dtype == jnp.bfloat16
    assert sam.decoder_dtype == jnp.float32
    # opt-out stays available
    sam_all_bf16 = build_sam("vit_t", dtype=jnp.bfloat16, image_size=256,
                             decoder_dtype=None)
    assert sam_all_bf16.decoder_dtype is None


def test_bf16_build_decode_matches_f32_build():
    """Same params + same f32 embedding -> the bf16 build's (f32) decode
    equals the f32 build's decode exactly; an all-bf16 build differs in
    dtype (sanity that the override changes anything at all)."""
    sam_f32 = build_sam("vit_t", dtype=jnp.float32, image_size=256)
    params = _tiny_params(sam_f32)
    sam_bf16 = build_sam("vit_t", dtype=jnp.bfloat16, image_size=256)
    sam_all_bf16 = build_sam("vit_t", dtype=jnp.bfloat16, image_size=256,
                             decoder_dtype=None)

    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 256),
                            jnp.float32)
    coords = jnp.asarray([[[40.0, 60.0]], [[100.0, 120.0]]])
    labels = jnp.ones((2, 1), jnp.int32)

    def decode(sam):
        masks, iou = sam.apply({"params": params}, emb, coords, labels,
                               None, None, True, True, method=sam.decode)
        return masks, iou

    m32, i32 = decode(sam_f32)
    mbf, ibf = decode(sam_bf16)
    mall, _ = decode(sam_all_bf16)

    assert m32.dtype == jnp.float32 and mbf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(mbf))
    np.testing.assert_array_equal(np.asarray(i32), np.asarray(ibf))
    assert mall.dtype != jnp.float32 or not np.array_equal(
        np.asarray(mall, np.float32), np.asarray(m32))
