"""Explicit pipeline parallelism over the slice stream (SURVEY §2.6 PP).

Two heterogeneous stages — A: coarse model + device CCA/prompt extraction,
B: SAM encode + batched decode — run as SEPARATE XLA programs on DISJOINT
device submeshes, with the host dispatching alternating microbatches.  JAX
dispatch is asynchronous, so stage A computes microbatch t while stage B
refines microbatch t-1; the prompt tensors move A->B with an async
``jax.device_put`` (ICI on real hardware).

When to use which parallelism for volume inference:

* **dp** (``ProtoSAM.forward_volume_sharded``) is strictly better when both
  encoders fit one chip — the z-stack is embarrassingly parallel and dp has
  zero communication and zero bubble.
* **pp** (this module) exists for when they do NOT fit together: each stage
  holds ONLY its own parameters (coarse weights never materialize on stage-B
  devices and vice versa — asserted by tests/test_pipeline_parallel.py), so
  a DINOv2-G + SAM-H pairing that OOMs a single chip still runs, at the
  cost of one microbatch of pipeline bubble.
* **tp** (``parallel.sharding``) shards single layers and composes with
  either.

The reference has no distributed path at all (SURVEY.md §2.6); its closest
analogue is the sequential per-slice loop (validation_protosam.py:351).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PipelinedVolumeRunner:
    """Drives a ``ProtoSAM``/``ProtoMedSAM`` pipeline as a 2-stage device
    pipeline over slice microbatches.

    ``stage_a_devices`` / ``stage_b_devices``: disjoint device lists.  Each
    stage forms its own ('data',) submesh; the microbatch is data-sharded
    within a stage, so pp composes with dp (e.g. 8 chips = 4+4).
    """

    def __init__(self, pipe, stage_a_devices, stage_b_devices, *,
                 val_wsize: int = 2):
        import numpy as np

        if set(stage_a_devices) & set(stage_b_devices):
            raise ValueError("pipeline stages must use disjoint devices")
        self.pipe = pipe
        self.val_wsize = val_wsize
        self.mesh_a = Mesh(np.asarray(stage_a_devices), ("data",))
        self.mesh_b = Mesh(np.asarray(stage_b_devices), ("data",))
        self._repl_a = NamedSharding(self.mesh_a, P())
        self._repl_b = NamedSharding(self.mesh_b, P())
        self._shard_a = NamedSharding(self.mesh_a, P("data"))
        self._shard_b = NamedSharding(self.mesh_b, P("data"))
        # stage-resident parameters: coarse weights live ONLY on stage A,
        # SAM weights ONLY on stage B — the memory split that motivates pp
        self.coarse_params = jax.device_put(pipe.coarse_params, self._repl_a)
        self.sam_params = jax.device_put(pipe.sam_params, self._repl_b)

        pipe_ref = pipe

        def stage_a(coarse_params, supp, fg, bg, qrys, supp_fts):
            out = pipe_ref.coarse_model.apply(
                {"params": coarse_params}, supp, fg, bg, qrys, True,
                val_wsize, supp_fts=supp_fts)
            logits = out["logits"]
            ex = jax.vmap(pipe_ref._extract_prompts)(qrys[:, None],
                                                     logits[:, None])
            return ex

        def stage_b(sam_params, ex, hw):
            embs = pipe_ref.sam_model.apply(
                {"params": sam_params}, ex["sam_image"],
                method=pipe_ref.sam_model.encode_image)
            return pipe_ref._decode_stage(
                sam_params, embs, ex["coords"], ex["labels"], ex["boxes"],
                ex["valid"], ex["pred"], hw,
                mask_inputs=ex.get("mask_inputs"))

        self._stage_a = jax.jit(stage_a)
        self._stage_b = jax.jit(stage_b, static_argnames=("hw",))

    def __call__(self, queries, coarse_model_input, microbatch: int = 4):
        """queries (N, 3, H, W) -> (preds (N, H, W), scores (N, K)).

        N is padded to a multiple of ``microbatch`` (which must be a
        multiple of the stage meshes' data sizes); results are cropped
        back.
        """
        inp = coarse_model_input
        n = queries.shape[0]
        m = microbatch
        if m % self.mesh_a.shape["data"] or m % self.mesh_b.shape["data"]:
            raise ValueError("microbatch must divide by both stage sizes")
        pad = (-n) % m
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.repeat(queries[-1:], pad, axis=0)], axis=0)
        hw = queries.shape[-2:]

        put_a = lambda x: jax.device_put(x, self._repl_a)
        supp = put_a(inp.supp_imgs)
        fg = put_a(inp.fore_mask)
        bg = put_a(inp.back_mask if inp.back_mask is not None
                   else 1.0 - inp.fore_mask)
        supp_fts = inp.supp_fts
        if supp_fts is None:
            supp_fts = self.pipe._jit_supp_fts(self.coarse_params, supp)
        supp_fts = put_a(supp_fts)

        chunks = [jax.device_put(queries[i:i + m], self._shard_a)
                  for i in range(0, queries.shape[0], m)]
        results = []
        pending = None  # ex dict already resident on stage B
        for chunk in chunks + [None]:
            if chunk is not None:
                ex = self._stage_a(self.coarse_params, supp, fg, bg, chunk,
                                   supp_fts)
            if pending is not None:
                # dispatches while stage A crunches the next microbatch
                results.append(self._stage_b(self.sam_params, pending,
                                             tuple(hw)))
            if chunk is not None:
                # async A->B transfer (ICI); the host does not block
                pending = jax.device_put(ex, self._shard_b)
        preds = jnp.concatenate([r[0] for r in results], axis=0)[:n]
        scores = jnp.concatenate([r[1] for r in results], axis=0)[:n]
        return preds, scores
