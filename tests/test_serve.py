"""Serving shim: register support, segment queries over HTTP."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.sam import build_sam
from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig
from protosam_tpu.serve import serve


@pytest.fixture(scope="module")
def server():
    rng = jax.random.PRNGKey(0)
    coarse = FewShotSeg(image_size=126, which_model="dinov2_t14")
    sam = build_sam("vit_t", image_size=256)
    supp = jax.random.normal(rng, (1, 3, 126, 126))
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    cp = coarse.init(rng, supp, fg, 1 - fg, supp)["params"]
    sp = sam.init(rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
                  jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    pipe = ProtoSAM(coarse, cp, sam, sp,
                    ProtoSAMConfig(image_size=(256, 256), use_cca=True,
                                   max_ccs=4))
    httpd = serve(pipe, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=payload, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.read()


def test_serve_flow(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and not h["support_registered"]

    # segment before support -> clean error
    buf = io.BytesIO()
    np.save(buf, np.zeros((3, 126, 126), np.float32))
    try:
        _post(server + "/segment", buf.getvalue())
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400

    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, 126, 126)).astype(np.float32)
    masks = np.zeros((1, 126, 126), np.float32)
    masks[:, 30:80, 30:80] = 1
    buf = io.BytesIO()
    np.savez(buf, images=images, masks=masks)
    _post(server + "/register_support", buf.getvalue())

    q = rng.standard_normal((3, 126, 126)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, q)
    out = np.load(io.BytesIO(_post(server + "/segment", buf.getvalue())))
    assert out.shape == (126, 126)
    assert set(np.unique(out)) <= {0.0, 1.0}
