"""Flash attention with decomposed relative-position bias (ViTDet global
blocks), as a Pallas kernel.

SAM's 4 global-attention layers are the one attention family the stock
flash kernel can't serve: their bias
``attn[q,k] += <q, Rh[qh,kh]> + <q, Rw[qw,kw]>``
(reference image_encoder.py:336-372) depends on the query vector, so
materializing it costs the same HBM traffic as the attention matrix itself
(the fallback is query-chunked attention in models/sam/image_encoder.py).
This kernel computes the bias on the fly per (q-row, k-block) tile from the
small (H, H, D)/(W, W, D) tables and runs streaming softmax, so nothing
quadratic ever leaves VMEM.

Tile layout (all 2-D — Mosaic cannot shape-cast the lane dimension, so no
4-D score tensors):
  * one program handles one grid ROW of W queries: q tile (W, D);
  * k-blocks are ``kv_rows`` grid rows (kv_rows*W keys);
  * bias_w[qw, kw] = <q[qw], Rw[qw, kw]> is k-block-invariant, expanded to
    (W, kv_rows*W) by lane-tiling with ``pltpu.repeat`` (col c ↦ kw = c%W);
  * bias_h[qw, kr] = <q[qw], Rh[q_row, k0+kr]> is expanded with an exact
    0/1 selector matmul T[kr, c] = (c//W == kr) (one nonzero per column, so
    the f32 product/sum is an exact copy, not an approximation).

Matmul operands stay in the input dtype (bf16 in production) with f32
accumulation — the same contract as the chunked XLA path's einsums.

Status: verified bit-close against the chunked reference in interpret mode
(tests/test_vitdet_flash.py) and on hardware via tools/tpu_suite.py
vitdet_flash; enabled on TPU through ``Attention(use_flash_relpos=True)``
(jax.lax.platform_dependent routes CPU lowering to the chunked path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *, kv_rows,
            grid_w, scale):
    """One (batch*head, q-row) program: stream over k-blocks.

    q_ref: (1, W, D); k_ref/v_ref: (1, S, D) full; rh_ref: (1, H, D) —
    this q-row's slice of the (H, H, D) table (carved by BlockSpec);
    rw_ref: (W, W, D); out_ref: (1, W, D).
    """
    w = grid_w
    d = q_ref.shape[-1]
    s = k_ref.shape[1]
    blk = kv_rows * w
    n_kblk = s // blk

    q = q_ref[0]                                   # (W, D) input dtype
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    # bias_w[qw, kw] = <q[qw], Rw[qw, kw]> — k-block independent.  A
    # batched dot_general with an empty lhs free-dim set fails Mosaic's
    # dot_dimension_numbers parser, so use broadcast-multiply + lane reduce
    # (W*W*D elements, trivial on the VPU).
    bias_w = jnp.sum(
        q.astype(jnp.float32)[:, None, :] * rw_ref[:].astype(jnp.float32),
        axis=-1)                                   # (W=qw, W=kw)
    bw_full = pltpu.repeat(bias_w, kv_rows, axis=1)             # (W, blk)

    # selector T[kr, c] = (c // W == kr): exact one-hot expansion matrix
    col = lax.broadcasted_iota(jnp.int32, (kv_rows, blk), 1)
    row = lax.broadcasted_iota(jnp.int32, (kv_rows, blk), 0)
    sel = (col // w == row).astype(jnp.float32)    # (kv_rows, blk)

    m = jnp.full((w, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((w, 1), jnp.float32)
    acc = jnp.zeros((w, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * blk, blk), :]  # (blk, D)
        v_blk = v_ref[0, pl.ds(kb * blk, blk), :]

        scores = lax.dot_general(
            qs, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (W, blk)

        # bias_h[qw, kr] = <q[qw], Rh[q_row, k0+kr]>
        rh_blk = rh_ref[0, pl.ds(kb * kv_rows, kv_rows), :]   # (kv_rows, D)
        bias_h = lax.dot_general(
            q, rh_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (W, kv_rows)
        bh_full = lax.dot_general(
            bias_h, sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (W, blk) exact copy

        scores = scores + bh_full + bw_full

        m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = lax.fori_loop(0, n_kblk, body, (m, l, acc))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def flash_attention_relpos(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, grid_hw,
                           scale: float, rows_per_blk: int = 8,
                           interpret: bool | None = None) -> jax.Array:
    """q/k/v: (B, S, heads, D) with S = H*W; Rh: (H, H, D); Rw: (W, W, D).

    Returns (B, S, heads, D).  ``rows_per_blk`` grid rows form one k-block;
    H must be divisible by it.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = grid_hw
    b, s, nh, d = q.shape
    assert s == h * w and h % rows_per_blk == 0

    def to_bh(x):  # (B, S, nh, D) -> (B*nh, S, D)
        return x.transpose(0, 2, 1, 3).reshape(b * nh, s, d)

    out = _call(to_bh(q), to_bh(k), to_bh(v), Rh.astype(q.dtype),
                Rw.astype(q.dtype), rows_per_blk, w, scale, interpret)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit,
                   static_argnames=("kv_rows", "grid_w", "scale",
                                    "interpret"))
def _call(q, k, v, rh, rw, kv_rows, grid_w, scale, interpret):
    bh, s, d = q.shape
    h = s // grid_w
    kernel = functools.partial(_kernel, kv_rows=kv_rows, grid_w=grid_w,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh, h),
        in_specs=[
            pl.BlockSpec((1, grid_w, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rh.shape[1], rh.shape[2]),
                         lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rw.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, grid_w, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rh, rw)
