"""Pallas attention kernels for ViTDet's decomposed relative-position bias
(SAM image encoder, reference image_encoder.py:196-372).

Two kernel families, both computing
``attn[q,k] = <q,k>*scale + <q, Rh[qh,kh]> + <q, Rw[qw,kw]>`` with softmax
fully on-chip (nothing quadratic ever reaches HBM):

* ``flash_attention_relpos`` — the 4 GLOBAL layers (64² grid, 4096 keys).
  One program handles ``rows_per_q_blk`` grid rows of queries (256+ rows)
  against the FULL key set: at 4096 keys the f32 score block
  (256, 4096) = 4 MB fits VMEM comfortably, so the kernel runs one big
  MXU dot + bias + one-pass softmax + one PV dot — no streaming loop.
  (The round-1 kernel processed ONE 64-query grid row per program; the
  64-row matmuls underutilized the MXU ~10× — VERDICT r1 perf item.)

* ``window_flash_attention`` — the windowed layers (14² windows, 196
  keys).  One program per (window, head): scores (196, 196) live entirely
  in VMEM, bias assembled with exact 0/1 selector matmuls.  Replaces the
  XLA path that materialized (windows, heads, 196, 196) f32 score/bias
  tensors in HBM (~150 ms/batch-8 of the round-1 pipeline budget).

Mosaic constraints honored throughout (see ROUND_NOTES): all tiles 2-D,
no lane-dim shape casts, biases expanded by exact one-hot matmuls (each
output element is 1.0 * x + zeros — a copy, not an approximation).
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

def _global_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *,
                   grid_w, rows_per_blk, scale):
    """One (batch*head, q-row-block) program.

    Row-major score space (queries on sublanes, keys on lanes).  A
    transposed variant (keys on sublanes, bias expansion as sublane
    broadcast/repeat instead of selector matmuls) measured 2-3x SLOWER on
    v5e — (4096, 256) MXU outputs and sublane-axis softmax reductions lose
    more than the bias matmuls cost.  Keep lane-major.

    q_ref: (1, R*W, D); k_ref/v_ref: (1, S, D) full; rh_ref: (1, R, H, D)
    this block's query-row slices of the (H, H, D) table; rw_ref: (W, W, D);
    out_ref: (1, R*W, D).
    """
    w = grid_w
    r = rows_per_blk
    d = q_ref.shape[-1]
    s = k_ref.shape[1]
    h = s // w

    q = q_ref[0]                                    # (R*W, D) input dtype
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    k = k_ref[0]
    v = v_ref[0]

    # main scores: one big MXU dot (R*W, S)
    scores = lax.dot_general(
        qs, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # bias_h[q, kh] = <q, Rh[qrow(q), kh]>; bias_w[q, kw] = <q, Rw[q%W, kw]>
    # assembled per query grid-row (R small dots), concatenated on sublanes.
    rw_flat = rw_ref[:].reshape(w * w, d)
    rows = lax.broadcasted_iota(jnp.int32, (w, w * w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (w, w * w), 1)
    keep_qw = cols // w == rows
    tile_eye = (lax.broadcasted_iota(jnp.int32, (w * w, w), 0) % w ==
                lax.broadcasted_iota(jnp.int32, (w * w, w), 1)
                ).astype(jnp.float32)
    bh_parts = []
    bw_parts = []
    for i in range(r):
        qi = q[i * w:(i + 1) * w, :]                # (W, D)
        bh_parts.append(lax.dot_general(
            qi, rh_ref[0, i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))    # (W, H)
        # bias_w for one grid row: <q[qw], Rw[qw, kw]> — selector matmul:
        # G[qw, (qw', kw)] = <q[qw], Rw[qw', kw]>, keep qw'==qw blocks
        g = lax.dot_general(
            qi, rw_flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (W, W*W)
        g = jnp.where(keep_qw, g, 0.0)
        bw_parts.append(lax.dot_general(
            g, tile_eye, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))    # (W, W)
    bias_h = jnp.concatenate(bh_parts, axis=0)      # (R*W, H)
    bias_w = jnp.concatenate(bw_parts, axis=0)      # (R*W, W)

    # expand bias_h over key columns: col c -> kh = c // W  (exact one-hot)
    sel_h = (lax.broadcasted_iota(jnp.int32, (h, s), 1) // w ==
             lax.broadcasted_iota(jnp.int32, (h, s), 0)).astype(jnp.float32)
    scores = scores + lax.dot_general(
        bias_h, sel_h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # expand bias_w: col c -> kw = c % W
    scores = scores + pltpu.repeat(bias_w, s // w, axis=1)

    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def flash_attention_relpos(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, grid_hw,
                           scale: float, rows_per_blk: int = 4,
                           interpret: bool | None = None) -> jax.Array:
    """q/k/v: (B, S, heads, D) with S = H*W; Rh: (H, H, D); Rw: (W, W, D).

    Returns (B, S, heads, D).  ``rows_per_blk`` grid rows of queries form
    one program's block; H must be divisible by it.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = grid_hw
    b, s, nh, d = q.shape
    assert s == h * w and h % rows_per_blk == 0

    def to_bh(x):  # (B, S, nh, D) -> (B*nh, S, D)
        return x.transpose(0, 2, 1, 3).reshape(b * nh, s, d)

    out = _call_global(to_bh(q), to_bh(k), to_bh(v), Rh.astype(q.dtype),
                       Rw.astype(q.dtype), rows_per_blk, w, scale, interpret)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_blk", "grid_w", "scale",
                                    "interpret"))
def _call_global(q, k, v, rh, rw, rows_per_blk, grid_w, scale, interpret):
    bh, s, d = q.shape
    h = s // grid_w
    kernel = functools.partial(_global_kernel, grid_w=grid_w,
                               rows_per_blk=rows_per_blk, scale=scale)
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
            pl.BlockSpec((1, rows_per_blk, rh.shape[1], rh.shape[2]),
                         lambda i, j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rw.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, rh[None], rw)


# ---------------------------------------------------------------------------
# windowed layers: one program per (window, head)
# ---------------------------------------------------------------------------

def _window_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *,
                   win, heads, scale):
    """One program per WINDOW, all heads looped inside (program-call
    overhead dominated the per-(window, head) variant: 2400 programs at
    ~2 µs each ≈ the whole kernel runtime).

    q/k/v_ref: (1, heads*S_w, D) with S_w = win*win; rh/rw_ref:
    (win, win, D).
    """
    sw = win * win
    d = q_ref.shape[-1]

    rw_flat = rw_ref[:].reshape(win * win, d)
    # loop-invariant selector constants (exact 0/1 matmuls).  A transposed
    # variant (keys on sublanes) measured 1.6x slower on v5e — keep
    # lane-major scores, like the global kernel.
    rows = lax.broadcasted_iota(jnp.int32, (win, win * win), 0)
    cols = lax.broadcasted_iota(jnp.int32, (win, win * win), 1)
    keep_qw = cols // win == rows                    # (win, win*win)
    tile_eye = (lax.broadcasted_iota(jnp.int32, (win * win, win), 0)
                % win ==
                lax.broadcasted_iota(jnp.int32, (win * win, win), 1)
                ).astype(jnp.float32)
    sel_h = (lax.broadcasted_iota(jnp.int32, (win, sw), 1) // win ==
             lax.broadcasted_iota(jnp.int32, (win, sw), 0)
             ).astype(jnp.float32)

    for hh in range(heads):
        q = q_ref[0, hh * sw:(hh + 1) * sw, :]       # (S_w, D)
        k = k_ref[0, hh * sw:(hh + 1) * sw, :]
        v = v_ref[0, hh * sw:(hh + 1) * sw, :]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

        scores = lax.dot_general(
            qs, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (S_w, S_w)

        bh_parts = []
        bw_parts = []
        for qh in range(win):
            qi = q[qh * win:(qh + 1) * win, :]       # (win, D) one qh row
            # bias_h[qw, kh] = <q[qh,qw], Rh[qh, kh]>
            bh_parts.append(lax.dot_general(
                qi, rh_ref[qh], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))  # (win, win)=(qw, kh)
            # bias_w[qw, kw] = <q[qh,qw], Rw[qw, kw]> — selector matmul
            g = lax.dot_general(
                qi, rw_flat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (win, win*win)
            g = jnp.where(keep_qw, g, 0.0)
            bw_parts.append(lax.dot_general(
                g, tile_eye, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (win, win)=(qw, kw)
        bias_h = jnp.concatenate(bh_parts, axis=0)   # (S_w, win)=(q, kh)
        bias_w = jnp.concatenate(bw_parts, axis=0)   # (S_w, win)=(q, kw)

        scores = scores + lax.dot_general(
            bias_h, sel_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores + pltpu.repeat(bias_w, sw // win, axis=1)

        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, hh * sw:(hh + 1) * sw, :] = (acc / l).astype(out_ref.dtype)


def window_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, win: int,
                           scale: float,
                           interpret: bool | None = None) -> jax.Array:
    """Windowed ViTDet attention, fused.

    q/k/v: (NW, S_w, heads, D) with S_w = win²; Rh/Rw: (win, win, D).
    Returns (NW, S_w, heads, D).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nw, sw, nh, d = q.shape
    assert sw == win * win

    def to_bh(x):  # (NW, S_w, nh, D) -> (NW, nh*S_w, D)
        return x.transpose(0, 2, 1, 3).reshape(nw, nh * sw, d)

    out = _call_window(to_bh(q), to_bh(k), to_bh(v), Rh.astype(q.dtype),
                       Rw.astype(q.dtype), win, nh, scale, interpret)
    return out.reshape(nw, nh, sw, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("win", "heads", "scale",
                                             "interpret"))
def _call_window(q, k, v, rh, rw, win, heads, scale, interpret):
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
            pl.BlockSpec(rh.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rw.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hsw, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, hsw, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rh, rw)
