"""Pallas attention kernels for ViTDet's decomposed relative-position bias
(SAM image encoder, reference image_encoder.py:196-372).

Two kernel families, both computing
``attn[q,k] = <q,k>*scale + <q, Rh[qh,kh]> + <q, Rw[qw,kw]>`` with softmax
fully on-chip (nothing quadratic ever reaches HBM):

* ``flash_attention_relpos`` — the 4 GLOBAL layers (64 x 64 grid, 4096
  keys).  One program handles ``rows_per_blk`` grid rows of queries
  against the FULL key set: the f32 score block fits VMEM, so the kernel
  runs one big MXU dot + bias + one-pass softmax + one PV dot — no
  streaming loop.
* ``window_flash_attention`` — the windowed layers (14 x 14 windows, 196
  keys).  One program per window, heads looped inside.

The COMPACT bias factors ``bias_h[q, kh] = <q, Rh[qh, kh]>`` and
``bias_w[q, kw] = <q, Rw[qw, kw]>`` are precomputed OUTSIDE the kernel as
batched XLA einsums (tiny: S x H and S x W per head, ~3 GFLOP total at
SAM-B) — computing them in-kernel as per-row small dots serialized the
MXU and selector-expanded bias_w cost as much as the score matmul itself.
In-kernel they expand to full key resolution exactly:

* ``kw = k %% W`` tiles with ``pltpu.repeat`` (pure data movement);
* ``kh = k // W`` expands with one exact 0/1 selector matmul (each output
  element is 1.0 * x + zeros — a copy, not an approximation).

A transposed-score variant (keys on sublanes, both expansions as sublane
broadcasts) measured 1.6-3x SLOWER on v5e — keep lane-major scores.
Matmul operands stay in the input dtype (bf16 in production) with f32
accumulation — the same contract as the chunked XLA path's einsums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# global layers: block-q, full-k
# ---------------------------------------------------------------------------

def _global_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, out_ref, *,
                   grid_w, scale):
    """One (batch*head, q-row-block) program.

    q_ref: (1, blk, D); k_ref/v_ref: (1, S, D) full;
    bh_ref: (1, blk, H) compact row bias; bw_ref: (1, blk, W) compact
    column bias; out_ref: (1, blk, D).
    """
    w = grid_w
    d = q_ref.shape[-1]
    s = k_ref.shape[1]
    h = s // w

    q = q_ref[0]                                    # (blk, D) input dtype
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    scores = lax.dot_general(
        qs, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (blk, S)

    # expand bias_h over key columns: col c -> kh = c // W (exact one-hot)
    sel_h = (lax.broadcasted_iota(jnp.int32, (h, s), 1) // w ==
             lax.broadcasted_iota(jnp.int32, (h, s), 0)).astype(jnp.float32)
    scores = scores + lax.dot_general(
        bh_ref[0], sel_h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # expand bias_w: col c -> kw = c % W (tiling repeat)
    scores = scores + pltpu.repeat(bw_ref[0], s // w, axis=1)

    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def _compact_biases(q, Rh, Rw, h, w):
    """bias_h (B, S, H) and bias_w (B, S, W) from q (B, S, D) — batched XLA
    einsums over the small rel-pos tables (q UNSCALED, like the reference's
    decomposed bias, image_encoder.py:336-372)."""
    b, s, d = q.shape
    qr = q.reshape(b, h, w, d)
    bias_h = jnp.einsum("bhwd,hkd->bhwk", qr.astype(jnp.float32),
                        Rh.astype(jnp.float32))
    bias_w = jnp.einsum("bhwd,wkd->bhwk", qr.astype(jnp.float32),
                        Rw.astype(jnp.float32))
    return (bias_h.reshape(b, s, h).astype(jnp.float32),
            bias_w.reshape(b, s, w).astype(jnp.float32))


def flash_attention_relpos(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, grid_hw,
                           scale: float, rows_per_blk: int = 4,
                           interpret: bool | None = None,
                           heads_first: bool = False) -> jax.Array:
    """q/k/v: (B, S, heads, D) with S = H*W — or (B, heads, S, D) with
    ``heads_first=True`` (the encoder projects qkv straight into this
    layout; the kernel batch reshape is then transpose-free).
    Rh: (H, H, D); Rw: (W, W, D).  Returns the input layout.
    ``rows_per_blk`` grid rows of queries form one program's block; H must
    be divisible by it.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = grid_hw
    if heads_first:
        b, nh, s, d = q.shape
        to_bh = lambda x: x.reshape(b * nh, s, d)
    else:
        b, s, nh, d = q.shape
        to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(b * nh, s, d)
    assert s == h * w and h % rows_per_blk == 0

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    bias_h, bias_w = _compact_biases(qb, Rh, Rw, h, w)
    out = _call_global(qb, kb, vb, bias_h, bias_w, rows_per_blk, w, scale,
                       interpret)
    out = out.reshape(b, nh, s, d)
    return out if heads_first else out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_blk", "grid_w", "scale",
                                    "interpret"))
def _call_global(q, k, v, bias_h, bias_w, rows_per_blk, grid_w, scale,
                 interpret):
    bh, s, d = q.shape
    h = s // grid_w
    kernel = functools.partial(_global_kernel, grid_w=grid_w, scale=scale)
    blk = rows_per_blk * grid_w
    return pl.pallas_call(
        kernel,
        grid=(bh, h // rows_per_blk),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, grid_w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w)


# ---------------------------------------------------------------------------
# windowed layers: one program per window, heads looped inside
# ---------------------------------------------------------------------------

def _window_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, out_ref, *,
                   win, heads, scale):
    """One program per WINDOW, all heads inside (program-call overhead
    dominated a per-(window, head) grid: 2400 programs at ~2 us each).

    q/k/v_ref: (1, heads*S_w, D); bh_ref/bw_ref: (1, heads*S_w, win)
    compact biases; out_ref like q_ref.
    """
    sw = win * win
    sel_h = (lax.broadcasted_iota(jnp.int32, (win, sw), 1) // win ==
             lax.broadcasted_iota(jnp.int32, (win, sw), 0)
             ).astype(jnp.float32)

    for hh in range(heads):
        sl = slice(hh * sw, (hh + 1) * sw)
        q = q_ref[0, sl, :]                          # (S_w, D)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

        scores = lax.dot_general(
            qs, k_ref[0, sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (S_w, S_w)

        scores = scores + lax.dot_general(
            bh_ref[0, sl, :], sel_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores + pltpu.repeat(bw_ref[0, sl, :], sw // win, axis=1)

        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, sl, :] = (acc / l).astype(out_ref.dtype)


def window_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, win: int,
                           scale: float,
                           interpret: bool | None = None,
                           heads_first: bool = False) -> jax.Array:
    """Windowed ViTDet attention, fused.

    q/k/v: (NW, S_w, heads, D) with S_w = win**2 — or (NW, heads, S_w, D)
    with ``heads_first=True`` (transpose-free kernel batch reshape).
    Rh/Rw: (win, win, D).  Returns the input layout.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if heads_first:
        nw, nh, sw, d = q.shape
        to_bh = lambda x: x.reshape(nw, nh * sw, d)
    else:
        nw, sw, nh, d = q.shape
        to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(nw, nh * sw, d)
    assert sw == win * win

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    bias_h, bias_w = _compact_biases(
        qb.reshape(nw * nh, sw, d), Rh, Rw, win, win)
    bias_h = bias_h.reshape(nw, nh * sw, win)
    bias_w = bias_w.reshape(nw, nh * sw, win)
    out = _call_window(qb, kb, vb, bias_h, bias_w, win, nh, scale, interpret)
    out = out.reshape(nw, nh, sw, d)
    return out if heads_first else out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("win", "heads", "scale",
                                             "interpret"))
def _call_window(q, k, v, bias_h, bias_w, win, heads, scale, interpret):
    nw, hsw, d = q.shape
    kernel = functools.partial(_window_kernel, win=win, heads=heads,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, hsw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hsw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hsw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hsw, win), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hsw, win), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hsw, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, hsw, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w)
