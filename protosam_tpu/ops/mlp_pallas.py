"""Fused transformer-MLP Pallas kernel: gelu(x@W1+b1)@W2 + b2 (+residual).

Why this exists (r4 HLO forensics, ROUND_NOTES.md): XLA lowers the SAM ViTDet
MLP Dense ops on (B, 64, 64, C) activations through the TPU *convolution*
emitter; at c=1280 (SAM vit_h, reference
models/segment_anything/build_sam.py:14-26) the chosen window config
("EmitAllBatchInSublanes", K-window 128, N-window 10) runs fc1 at ~65% and
fc2 at ~50% of the bf16 MXU peak — 3.9 ms/layer-batch8 where the flop floor
is 2.2.  The fused kernel instead:

* streams M-tiles of the (M, C) activation through VMEM while both weight
  matrices stay resident across the whole grid (constant index_map — at
  c=1280 W1+W2 are 25 MB of bf16, well under the 128 MB VMEM),
* runs both dots as plain MXU matmuls with f32 accumulation,
* applies the tanh GELU between them in f32 registers (the production bf16
  path's activation, models/sam/image_encoder._gelu),
* folds the residual add into the epilogue, so the only HBM traffic is
  x / residual in and out once (the XLA path round-trips the (M, 4C)
  hidden activation through HBM between the two conv fusions).

Inference-only: no custom VJP (the SAM encoder's attention kernels set the
same constraint; training paths keep the unfused Dense composition).

OUTCOME (r4 on-chip marginal-cost A/B at M=32768, C=1280, H=5120 —
ROUND_NOTES): the kernel MEASURED A LOSS.  Best config (block_m=2048-4096,
h_chunks=8) = 5.0 ms/layer-batch8 marginal vs XLA at 4.6-4.8 for EVERY
lowering route tried (2-D dot, (8,4096)/(32,1024) batched 3-D, and the 4-D
conv-emitter form are all within noise of each other) — i.e. the r3 "conv
emitter at 50% MXU" per-op trace attribution does not translate into
harvestable wall-clock: the whole MLP stage costs ~4.6 ms/layer no matter
how the dots are routed, and the Pallas form pays ~0.4 ms extra.  The
default stays OFF (image_encoder.Block._mlp_fuse_enabled);
``PTPU_MLP_PALLAS=1`` keeps the experiment reproducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, res_ref, out_ref,
            h_chunks: int = 1):
    """``h_chunks`` splits the hidden dim: chunk j+1's fc1 dot is independent
    of chunk j's GELU, so the unrolled chunks let Mosaic overlap the VPU
    tanh (which is comparable to the MXU time at the vit_h widths — the
    unchunked kernel serialized dot1 -> gelu -> dot2 and measured 5.0
    ms/layer vs the 2.2 flop floor) with the next chunk's matmul, and cap
    the live f32 hidden intermediate at (block_m, H/h_chunks)."""
    x = x_ref[:]
    y = b2_ref[:].astype(jnp.float32)
    if res_ref is not None:
        y = y + res_ref[:].astype(jnp.float32)
    hdim = w1_ref.shape[1]
    hc = hdim // h_chunks
    for j in range(h_chunks):
        sl = slice(j * hc, (j + 1) * hc)
        h = jnp.dot(x, w1_ref[:, sl], preferred_element_type=jnp.float32)
        h = h + b1_ref[:, sl].astype(jnp.float32)
        g = jax.nn.gelu(h, approximate=True)
        y = y + jnp.dot(g.astype(x.dtype), w2_ref[sl, :],
                        preferred_element_type=jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _pick_block_m(m: int, target: int = 512) -> int:
    """Largest divisor of m that is <= target and a multiple of 8 (sublane
    tile) — M here is B*H*W of a ViT grid, so 8 | m always holds in
    practice; fall back to m itself for odd sizes."""
    for bm in range(min(target, m), 7, -1):
        if m % bm == 0 and bm % 8 == 0:
            return bm
    return m


def _dense_kernel(x_ref, w_ref, b_ref, res_ref, out_ref):
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y + b_ref[:].astype(jnp.float32)
    y = y + res_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_residual(x: jax.Array, w: jax.Array, b: jax.Array,
                   residual: jax.Array, interpret: bool = False) -> jax.Array:
    """``x @ w + b + residual`` with the weight VMEM-resident across the
    M-tile grid — the attention-proj companion of :func:`mlp_fused` (same
    conv-emitter pathology at c=1280: proj measured 0.58 ms/layer-batch8 vs
    a 0.27 flop floor)."""
    m, c = x.shape
    n = w.shape[1]
    bm = _pick_block_m(m)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _dense_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), row),
            pl.BlockSpec((c, n), const),
            pl.BlockSpec((1, n), const),
            pl.BlockSpec((bm, n), row),
        ],
        out_specs=pl.BlockSpec((bm, n), row),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * n,
            bytes_accessed=2 * (c * n + m * c + 2 * m * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, n), residual)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block_m", "h_chunks"))
def mlp_fused(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, residual: jax.Array | None = None,
              interpret: bool = False, block_m: int = 0,
              h_chunks: int = 4) -> jax.Array:
    """``gelu_tanh(x @ w1 + b1) @ w2 + b2 (+ residual)`` on the MXU.

    x: (M, C); w1: (C, H); b1: (H,); w2: (H, C); b2: (C,);
    residual: (M, C) or None.  Returns (M, C) in x.dtype.
    ``block_m``: M-tile rows per grid step (0 = auto); ``h_chunks``:
    hidden-dim split for MXU/VPU overlap (see _kernel).
    """
    m, c = x.shape
    hdim = w1.shape[1]
    bm = block_m or _pick_block_m(m)
    while hdim % h_chunks:
        h_chunks -= 1
    grid = (m // bm,)
    b1r = b1.reshape(1, hdim)
    b2r = b2.reshape(1, c)

    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((bm, c), row),
        pl.BlockSpec((c, hdim), const),
        pl.BlockSpec((1, hdim), const),
        pl.BlockSpec((hdim, c), const),
        pl.BlockSpec((1, c), const),
    ]
    args = [x, w1, b1r, w2, b2r]
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, c), row))
        args.append(residual)
        kernel = functools.partial(_kernel, h_chunks=h_chunks)
    else:
        kernel = functools.partial(
            lambda xr, w1r, b1r_, w2r, b2r_, or_: _kernel(
                xr, w1r, b1r_, w2r, b2r_, None, or_, h_chunks=h_chunks))

    bytes_w = 2 * (c * hdim + hdim * c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c), row),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (c * hdim + hdim * c),
            bytes_accessed=bytes_w + 2 * m * c * (3 if residual is not None
                                                  else 2),
            transcendentals=m * hdim,
        ),
        interpret=interpret,
    )(*args)
