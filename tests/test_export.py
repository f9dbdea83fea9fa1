"""StableHLO decoder export round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.sam import build_sam
from protosam_tpu.utils.export import export_decoder, load_exported


def test_export_roundtrip():
    sam = build_sam("vit_t", image_size=128)
    params = sam.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                      jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
                      jnp.zeros((1, 4)))["params"]
    blob = export_decoder(sam, params)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_exported(blob)
    grid = 128 // 16
    emb = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, grid, grid, 256)), jnp.float32)
    coords = jnp.asarray([[[30.0, 40.0], [60.0, 50.0]]])
    labels = jnp.ones((1, 2), jnp.int32)
    boxes = jnp.asarray([[10.0, 10.0, 100.0, 100.0]])
    masks, iou = fn(emb, coords, labels, boxes)
    want_m, want_iou = sam.apply({"params": params}, emb, coords, labels,
                                 boxes, None, False, False,
                                 method=sam.decode)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(want_m),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(want_iou),
                               atol=1e-5)
