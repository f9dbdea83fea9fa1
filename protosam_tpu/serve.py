"""Minimal production serving shim for the ProtoSAM pipeline.

One-shot segmentation as a service: the support set is registered once
(per organ/task), then queries stream through the jitted pipeline.  The
wire format is raw .npy payloads (no external deps):

  POST /register_support   body: npz{images(S,3,H,W), masks(S,H,W)}
  POST /segment            body: npy (3,H,W) or (N,3,H,W)  -> npy mask(s)
  GET  /healthz            -> {"status": "ok", "device": ...}

Usage:  python -m protosam_tpu.serve with modelname=dinov2_l14 ... port=8000
"""

from __future__ import annotations

import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax.numpy as jnp

log = logging.getLogger("serve")


class PipelineService:
    def __init__(self, pipe, val_wsize: int = 2, slice_batch: int = 4):
        self.pipe = pipe
        self.val_wsize = val_wsize
        self.slice_batch = slice_batch
        self.lock = threading.Lock()
        self.inp = None

    def register_support(self, images: np.ndarray, masks: np.ndarray):
        from protosam_tpu.models.io_protocol import ALPNetInput

        with self.lock:
            self.inp = ALPNetInput(jnp.asarray(images), jnp.asarray(masks),
                                   jnp.asarray(images[:1]),
                                   isval=True, val_wsize=self.val_wsize)
            # pre-encode support features once (cached for every query)
            self.inp.supp_fts = self.pipe._jit_supp_fts(
                self.pipe.coarse_params, self.inp.supp_imgs)

    def segment(self, query: np.ndarray) -> np.ndarray:
        if self.inp is None:
            raise RuntimeError("no support set registered")
        q = np.asarray(query, np.float32)
        if q.ndim == 3:
            with self.lock:
                pred, _ = self.pipe.forward(jnp.asarray(q)[None], self.inp)
            return np.asarray(pred)
        with self.lock:
            preds, _ = self.pipe.forward_volume(
                jnp.asarray(q), self.inp, slice_batch=self.slice_batch)
        return np.asarray(preds)


def make_handler(service: PipelineService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            log.debug(fmt, *args)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                body = json.dumps({
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "support_registered": service.inp is not None,
                }).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                if self.path == "/register_support":
                    npz = np.load(io.BytesIO(data))
                    service.register_support(npz["images"], npz["masks"])
                    self._send(200, json.dumps({"status": "ok"}).encode(),
                               "application/json")
                elif self.path == "/segment":
                    arr = np.load(io.BytesIO(data))
                    out = service.segment(arr)
                    buf = io.BytesIO()
                    np.save(buf, out)
                    self._send(200, buf.getvalue())
                else:
                    self._send(404, b"not found")
            except Exception as e:  # noqa: BLE001 — report errors to client
                log.exception("request failed")
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")

    return Handler


def serve(pipe, host: str = "0.0.0.0", port: int = 8000, **kwargs
          ) -> ThreadingHTTPServer:
    service = PipelineService(pipe, **kwargs)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service
    return httpd


def main(argv=None):
    import sys

    from protosam_tpu.eval.protosam_eval import build_models
    from protosam_tpu.utils.config import load_config

    logging.basicConfig(level=logging.INFO)
    cfg = load_config(argv if argv is not None else sys.argv[1:])
    pipe = build_models(cfg)
    httpd = serve(pipe, port=int(getattr(cfg, "port", 8000) or 8000),
                  val_wsize=cfg.val_wsize, slice_batch=cfg.slice_batch)
    log.info("serving on :%d", httpd.server_address[1])
    httpd.serve_forever()


if __name__ == "__main__":
    main()
