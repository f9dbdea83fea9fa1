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
``bias_w[q, kw] = <q, Rw[qw, kw]>`` are precomputed OUTSIDE the kernels as
batched XLA einsums (tiny: S x H and S x W per head, ~3 GFLOP total at
SAM-B), then FOLDED INTO the score contraction: the kernels receive
``q_aug = [q*scale | bias_h | bias_w]`` and ``k_aug = [k | 0/1 selector
columns]`` so ONE full-width MXU dot yields scores + bias exactly (the
selector columns contribute 1.0 * bias + zeros — copies, not
approximations).  The contraction dim grows D -> D+H+W (64 -> 192 at
SAM's global grid), which fills the 128-lane MXU instead of running a
second expansion matmul.

Design notes from the v5e iteration log (ROUND_NOTES.md): in-kernel
per-row bias dots serialize the MXU; a transposed-score variant (keys on
sublanes) is 1.6-3x slower; a per-(window,head) 4-D-block grid loses to
a heads-inside loop.  bf16 production inputs quantize the bias to bf16
(the f32 path is exact; strict mask agreement is scoped to
dtype=float32, PARITY.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# global layers: block-q, full-k
# ---------------------------------------------------------------------------

def _aug_kernel(q_ref, k_ref, v_ref, out_ref):
    """One (batch*head, q-block) program over AUGMENTED operands.

    The caller folds the decomposed rel-pos bias into the contraction dim:
    q_aug = [q*scale | bias_h | bias_w], k_aug = [k | sel_h | sel_w] with
    exact 0/1 selectors, so ONE full-width MXU dot produces
    scores = <q,k>*scale + bias_h[q, k//W] + bias_w[q, k%W] directly
    (the selector columns contribute 1.0 * bias + zeros — copies, not
    approximations).  The contraction dim grows D -> D+H+W (64 -> 192 at
    SAM's grids), which FILLS the 128-lane MXU instead of running a
    second expansion matmul.

    q_ref: (1, blk, D+H+W); k_ref: (1, S, D+H+W); v_ref: (1, S, D).
    """
    q = q_ref[0]
    scores = lax.dot_general(
        q, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (blk, S)

    m = jnp.max(scores, axis=1, keepdims=True)
    # exp lands directly in the PV operand dtype — saves one full pass
    # over the score matrix (the separate f32->bf16 cast); the row-sum
    # still accumulates in f32.  Exact no-op when v is f32.
    p = jnp.exp(scores - m).astype(v_ref.dtype)
    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    acc = lax.dot_general(
        p, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _selectors_np(h, w):
    """(S, H+W) exact 0/1 selector block: col j<H hits keys with k//W == j,
    col H+j hits keys with k%W == j."""
    import numpy as np

    k = np.arange(h * w)
    sel_h = (k[:, None] // w == np.arange(h)[None, :])
    sel_w = (k[:, None] % w == np.arange(w)[None, :])
    return np.concatenate([sel_h, sel_w], axis=1).astype(np.float32)


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
    qs = (qb.astype(jnp.float32) * scale).astype(qb.dtype)
    q_aug = jnp.concatenate(
        [qs, bias_h.astype(qb.dtype), bias_w.astype(qb.dtype)], axis=-1)
    sel = jnp.asarray(_selectors_np(h, w), qb.dtype)
    k_aug = jnp.concatenate(
        [kb, jnp.broadcast_to(sel[None], (kb.shape[0],) + sel.shape)],
        axis=-1)
    out = _call_global(q_aug, k_aug, vb, rows_per_blk, w, interpret)
    out = out.reshape(b, nh, s, d)
    return out if heads_first else out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_blk", "grid_w", "interpret"))
def _call_global(q_aug, k_aug, v, rows_per_blk, grid_w, interpret):
    bh, s, da = q_aug.shape
    d = v.shape[-1]
    h = s // grid_w
    blk = rows_per_blk * grid_w
    return pl.pallas_call(
        _aug_kernel,
        grid=(bh, h // rows_per_blk),
        in_specs=[
            pl.BlockSpec((1, blk, da), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, da), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q_aug, k_aug, v)


# ---------------------------------------------------------------------------
# windowed layers: one program per window, heads looped inside
# ---------------------------------------------------------------------------

def _window_aug_loop_kernel(q_ref, k_ref, v_ref, out_ref, *, heads, sw):
    """Heads-inside-loop variant of _window_aug_kernel: one program per
    ``wpp`` windows, refs (1, wpp*heads*S_w, ...) sliced per (window, head)
    (v3's winning grid shape, now with augmented operands; ``heads`` here
    is wpp*true_heads)."""
    for hh in range(heads):
        sl = slice(hh * sw, (hh + 1) * sw)
        scores = lax.dot_general(
            q_ref[0, sl, :], k_ref[0, sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(scores, axis=1, keepdims=True)
        pp = jnp.exp(scores - m)
        l = jnp.sum(pp, axis=1, keepdims=True)
        acc = lax.dot_general(
            pp.astype(v_ref.dtype), v_ref[0, sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, sl, :] = (acc / l).astype(out_ref.dtype)


def _window_aug_kernel(q_ref, k_ref, v_ref, out_ref):
    """One program per (window, head) via a 2-D grid with 4-D block refs
    (per-head blocks are padded/aligned independently — slicing a fused
    heads*S_w ref at stride 196 was sublane-misaligned and forced per-head
    relayout copies).  Operands are bias-AUGMENTED like _aug_kernel:
    one full-width dot produces scores + decomposed bias exactly.

    q_ref/k_ref: (1, 1, S_w, D+2*win); v_ref: (1, 1, S_w, D).
    """
    q = q_ref[0, 0]
    scores = lax.dot_general(
        q, k_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (S_w, S_w)

    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = (acc / l).astype(out_ref.dtype)


def window_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, win: int,
                           scale: float,
                           interpret: bool | None = None,
                           heads_first: bool = False,
                           per_head_grid: bool = False,
                           wpp: int = 1) -> jax.Array:
    """Windowed ViTDet attention, fused.  ``wpp`` = windows per program
    (must divide NW); >1 amortizes per-program overhead across more small
    dots.

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

    qb, kb, vb = (x.reshape(nw, nh, sw, d) for x in
                  (to_bh(q), to_bh(k), to_bh(v)))
    bias_h, bias_w = _compact_biases(
        qb.reshape(nw * nh, sw, d), Rh, Rw, win, win)
    qs = (qb.astype(jnp.float32) * scale).astype(qb.dtype)
    q_aug = jnp.concatenate(
        [qs, bias_h.reshape(nw, nh, sw, win).astype(qb.dtype),
         bias_w.reshape(nw, nh, sw, win).astype(qb.dtype)], axis=-1)
    sel = jnp.asarray(_selectors_np(win, win), qb.dtype)
    k_aug = jnp.concatenate(
        [kb, jnp.broadcast_to(sel[None, None], (nw, nh) + sel.shape)],
        axis=-1)
    out = _call_window(q_aug, k_aug, vb, win, interpret, per_head_grid,
                       wpp=wpp)
    return out if heads_first else out.transpose(0, 2, 1, 3)


def _global_packed_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref,
                          qa_ref, ka_ref, va_ref, *, gh, gw, hd, hpb,
                          scale):
    """One program per (batch, head-GROUP, q-row-block) over the PACKED
    qkv.

    Mosaic requires lane-block widths to be 128-multiples, so heads are
    grouped ``hpb`` per block (hpb*hd % 128 == 0; 2 for head_dim 64, 8
    for ViT-H's 80) and sliced in-kernel — no head-split transpose ever
    exists in HBM.  k_aug = [k | selectors] lives in scratch (one buffer
    per head in the group) and is rebuilt only when the (batch, group)
    changes (q-block is the innermost grid dim); q_aug = [q*scale | bias]
    is assembled per program.  One full-width dot then yields
    scores + decomposed rel-pos bias exactly (see _aug_kernel).
    """
    rows = q_ref.shape[1]
    nq, s = rows * gw, gh * gw
    aug = hd + gh + gw
    hw = hpb * hd

    @pl.when(pl.program_id(2) == 0)
    def _build_ka():
        r = lax.broadcasted_iota(jnp.int32, (s, gh + gw), 0)
        j = lax.broadcasted_iota(jnp.int32, (s, gh + gw), 1)
        sel_h = ((r // gw) == j) & (j < gh)
        sel_w = ((r % gw) == (j - gh)) & (j >= gh)
        sel = (sel_h | sel_w).astype(ka_ref.dtype)
        kk = k_ref[0].reshape(s, hw)
        for i in range(hpb):
            ka_ref[i, :, hd:] = sel
            ka_ref[i, :, :hd] = kk[:, i * hd:(i + 1) * hd]

    qq = q_ref[0].reshape(nq, hw)
    bb = bias_ref[0].reshape(nq, hpb * (gh + gw))
    vv = v_ref[0].reshape(s, hw)
    # ones lane once per program: acc_aug = p @ [v | 1] yields the weighted
    # sum AND the softmax normalizer in one dot (N=hd+1 <= 128 stays one
    # MXU N-tile — the row-sum costs zero extra MXU time and the (nq, S)
    # VPU sum pass disappears; same fold as ops/attention._packed_aug_kernel)
    va_ref[:, hd:hd + 1] = jnp.ones((s, 1), va_ref.dtype)
    for i in range(hpb):
        qa_ref[:, :hd] = (qq[:, i * hd:(i + 1) * hd].astype(jnp.float32)
                          * scale).astype(qa_ref.dtype)
        qa_ref[:, hd:] = bb[:, i * (gh + gw):(i + 1) * (gh + gw)]
        scores = lax.dot_general(
            qa_ref[...], ka_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (nq, S)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(vv.dtype)
        va_ref[:, :hd] = vv[:, i * hd:(i + 1) * hd]
        acc = lax.dot_general(
            p, va_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (nq, hd+1)
        out_ref[0, :, :, i * hd:(i + 1) * hd] = (
            (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)
            .reshape(rows, gw, hd))


@functools.partial(jax.jit, static_argnames=("nh", "rows_per_blk", "scale",
                                             "interpret"))
def _call_global_packed(qkv, bias, nh, rows_per_blk, scale, interpret):
    b, gh, gw, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    # heads per lane block: smallest group whose lane width is a
    # 128-multiple (Mosaic block constraint) and divides the head count
    hpb = next((h for h in range(1, nh + 1)
                if (h * hd) % 128 == 0 and nh % h == 0), None)
    if hpb is None:
        if not interpret:
            raise ValueError(
                f"global packed: no head grouping with 128-multiple lanes "
                f"for nh={nh}, head_dim={hd}")
        hpb = nh  # interpret mode (test-size geometries): no constraint
    aug = hd + gh + gw
    hw = hpb * hd
    ng = nh // hpb
    grid = (b, ng, gh // rows_per_blk)
    out = pl.pallas_call(
        functools.partial(_global_packed_kernel, gh=gh, gw=gw, hd=hd,
                          hpb=hpb, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows_per_blk, gw, hw),
                         lambda i, h, j: (i, j, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh, gw, hw),
                         lambda i, h, j, ng=ng: (i, 0, 0, ng + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh, gw, hw),
                         lambda i, h, j, ng=ng: (i, 0, 0, 2 * ng + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_blk, gw, hpb * (gh + gw)),
                         lambda i, h, j: (i, j, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per_blk, gw, hw),
                               lambda i, h, j: (i, j, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh, gw, c), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((rows_per_blk * gw, aug), qkv.dtype),
                        pltpu.VMEM((hpb, gh * gw, aug), qkv.dtype),
                        pltpu.VMEM((gh * gw, hd + 1), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv, qkv, qkv, bias)
    return out


def global_packed_attention(qkv: jax.Array, bias: jax.Array,
                            num_heads: int, scale: float,
                            rows_per_blk: int = 16,
                            interpret: bool | None = None) -> jax.Array:
    """Fused global ViTDet attention over PACKED operands.

    qkv: (B, H, W, 3C) raw fused projection; bias: (B, H, W, nh*(H+W))
    compact rel-pos factors [bias_h | bias_w] per head.  Returns
    (B, H, W, C).  H must be divisible by ``rows_per_blk``.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _call_global_packed(qkv, bias, num_heads, rows_per_blk,
                               float(scale), interpret)


def _window_packed_kernel(qkv_ref, bias_ref, out_ref, qa_ref, ka_ref,
                          va_ref, *, nh, hd, win, scale, wcp=1):
    """One program per (batch, window-row, window-col): the window's packed
    (win², 3C) qkv block and its (win², nh*2*win) compact-bias block live
    in VMEM; per head the augmented operands are assembled into scratch
    (q_aug = [q*scale | bias_h | bias_w | 0], k_aug = [k | sel | 0], both
    128 lanes) and ONE full-width dot yields scores + decomposed rel-pos
    bias exactly, as in _window_aug_loop_kernel.  The 0/1 selector columns
    are built once per program from iota (k//win and k%win hit the bias_h /
    bias_w lanes).  No (windows, heads, S_w, D) tensor ever exists in HBM —
    window partition is pure BlockSpec indexing."""
    sw = win * win
    c = nh * hd
    aug = hd + 2 * win

    # selector + zero tail lanes, once per program (amortized over
    # wcp * nh head dots)
    r = lax.broadcasted_iota(jnp.int32, (sw, 128 - hd), 0)
    j = lax.broadcasted_iota(jnp.int32, (sw, 128 - hd), 1)
    # pure logical masks: a boolean select_n with a scalar False lowers to
    # an unsupported i8->i1 truncation on Mosaic
    sel_h = ((r // win) == j) & (j < win)
    sel_w = ((r % win) == (j - win)) & (j >= win) & (j < 2 * win)
    ka_ref[:, hd:] = (sel_h | sel_w).astype(ka_ref.dtype)
    qa_ref[:, aug:] = jnp.zeros((sw, 128 - aug), qa_ref.dtype)
    # ones lane for the PV sum-fold (see _global_packed_kernel)
    va_ref[:, hd:hd + 1] = jnp.ones((sw, 1), va_ref.dtype)

    for wi in range(wcp):
        data = qkv_ref[0, 0, :, wi, :, :].reshape(sw, 3 * c)
        bias = bias_ref[0, 0, :, wi, :, :].reshape(sw, nh * 2 * win)
        for h in range(nh):
            qa_ref[:, :hd] = (data[:, h * hd:(h + 1) * hd]
                              .astype(jnp.float32)
                              * scale).astype(qa_ref.dtype)
            qa_ref[:, hd:aug] = bias[:, h * 2 * win:(h + 1) * 2 * win]
            ka_ref[:, :hd] = data[:, c + h * hd:c + (h + 1) * hd]
            scores = lax.dot_general(
                qa_ref[...], ka_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S_w, S_w)
            m = jnp.max(scores, axis=1, keepdims=True)
            v = data[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            p = jnp.exp(scores - m).astype(v.dtype)
            va_ref[:, :hd] = v
            acc = lax.dot_general(
                p, va_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, 0, :, wi, :, h * hd:(h + 1) * hd] = (
                (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)
                .reshape(win, win, hd))


@functools.partial(jax.jit, static_argnames=("win", "nh", "scale",
                                             "interpret", "wcp"))
def _call_window_packed(qkv_pad, bias_pad, win, nh, scale, interpret,
                        wcp=1):
    b, hp, wp, c3 = qkv_pad.shape
    c = c3 // 3
    hd = c // nh
    nwy, nwx = hp // win, wp // win
    if nwx % wcp:
        raise ValueError(f"wcp={wcp} must divide nwx={nwx}")
    r6 = lambda x: x.reshape(b, nwy, win, nwx, win, x.shape[-1])
    blk = lambda last: pl.BlockSpec(
        (1, 1, win, wcp, win, last),
        lambda i, y, x: (i, y, 0, x, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_window_packed_kernel, nh=nh, hd=hd, win=win,
                          scale=scale, wcp=wcp),
        grid=(b, nwy, nwx // wcp),
        in_specs=[blk(c3), blk(nh * 2 * win)],
        out_specs=blk(c),
        out_shape=jax.ShapeDtypeStruct((b, nwy, win, nwx, win, c),
                                       qkv_pad.dtype),
        scratch_shapes=[pltpu.VMEM((win * win, 128), qkv_pad.dtype),
                        pltpu.VMEM((win * win, 128), qkv_pad.dtype),
                        pltpu.VMEM((win * win, hd + 1), qkv_pad.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r6(qkv_pad), r6(bias_pad))
    return out.reshape(b, hp, wp, c)


def _window_packed_flat_kernel(qkv_ref, bias_ref, out_ref, qa_ref, ka_ref,
                               va_ref, *, nh, hd, win, scale, nwx, nbuf=1):
    """Full-window-row programs over the FLAT (B, Hp, Wp, 3C) array.

    The 6-D window reshape of the blocked variant is a sublane relayout
    in HBM (tiling pads each 14-row window block to 16 sublanes), which
    XLA materializes as whole-tensor copies on both sides of the kernel —
    ~4 ms/layer on ViT-H.  Here the BlockSpec keeps the array 4-D (legal:
    the second-to-last block dim spans the full padded width) and each
    window's (win², ·) view is assembled in-kernel by the same per-head
    scratch copies the kernel already does."""
    sw = win * win
    c = nh * hd
    aug = hd + 2 * win

    r = lax.broadcasted_iota(jnp.int32, (sw, 128 - hd), 0)
    j = lax.broadcasted_iota(jnp.int32, (sw, 128 - hd), 1)
    sel_h = ((r // win) == j) & (j < win)
    sel_w = ((r % win) == (j - win)) & (j >= win) & (j < 2 * win)
    for bno in range(nbuf):
        ka_ref[bno, :, hd:] = (sel_h | sel_w).astype(ka_ref.dtype)
        qa_ref[bno, :, aug:] = jnp.zeros((sw, 128 - aug), qa_ref.dtype)
        # ones lane for the PV sum-fold (see _global_packed_kernel)
        va_ref[bno, :, hd:hd + 1] = jnp.ones((sw, 1), va_ref.dtype)

    # qa/ka scratch rotates over nbuf buffers: with one buffer every
    # unrolled (window, head) iteration has a write-after-read hazard on
    # the scratch, serializing the whole chain; alternating buffers lets
    # Mosaic overlap iteration i's softmax (VPU) with i+1's operand
    # copies and score dot (MXU).
    it = 0
    for wi in range(nwx):
        cols = slice(wi * win, (wi + 1) * win)
        data = qkv_ref[0, :, cols, :].reshape(sw, 3 * c)
        bias = bias_ref[0, :, cols, :].reshape(sw, nh * 2 * win)
        for h in range(nh):
            bno = it % nbuf
            it += 1
            qa_ref[bno, :, :hd] = (data[:, h * hd:(h + 1) * hd]
                                   .astype(jnp.float32)
                                   * scale).astype(qa_ref.dtype)
            qa_ref[bno, :, hd:aug] = bias[:, h * 2 * win:(h + 1) * 2 * win]
            ka_ref[bno, :, :hd] = data[:, c + h * hd:c + (h + 1) * hd]
            scores = lax.dot_general(
                qa_ref[bno], ka_ref[bno],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(scores, axis=1, keepdims=True)
            v = data[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            p = jnp.exp(scores - m).astype(v.dtype)
            va_ref[bno, :, :hd] = v
            acc = lax.dot_general(
                p, va_ref[bno],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, :, cols, h * hd:(h + 1) * hd] = (
                (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)
                .reshape(win, win, hd))


@functools.partial(jax.jit, static_argnames=("win", "nh", "scale",
                                             "interpret", "nbuf"))
def _call_window_packed_flat(qkv_pad, bias_pad, win, nh, scale, interpret,
                             nbuf=None):
    if nbuf is None:  # scratch rotation depth (env knob for on-chip A/B)
        nbuf = int(os.environ.get("PTPU_WINDOW_NBUF", "2"))
    b, hp, wp, c3 = qkv_pad.shape
    c = c3 // 3
    hd = c // nh
    nwy, nwx = hp // win, wp // win
    blk = lambda last: pl.BlockSpec(
        (1, win, wp, last), lambda i, y: (i, y, 0, 0),
        memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((nbuf, win * win, 128), qkv_pad.dtype),
               pltpu.VMEM((nbuf, win * win, 128), qkv_pad.dtype),
               pltpu.VMEM((nbuf, win * win, hd + 1), qkv_pad.dtype)]
    kernel = functools.partial(_window_packed_flat_kernel, nh=nh,
                               hd=hd, win=win, scale=scale, nwx=nwx,
                               nbuf=nbuf)
    out = pl.pallas_call(
        kernel,
        grid=(b, nwy),
        in_specs=[blk(c3), blk(nh * 2 * win)],
        out_specs=blk(c),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv_pad.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv_pad, bias_pad)
    return out


def window_packed_attention(qkv_pad: jax.Array, bias_pad: jax.Array,
                            win: int, num_heads: int, scale: float,
                            interpret: bool | None = None,
                            wcp: int = 1, flat: bool = False) -> jax.Array:
    """Fused windowed ViTDet attention over PACKED operands.

    qkv_pad: (B, Hp, Wp, 3C), window-padded with the qkv projection's BIAS
    values (the reference pads x with zeros BEFORE the projection,
    image_encoder.py:254-300 — Dense(0) = bias, so pad-token keys carry the
    bias exactly like the reference's);
    bias_pad: (B, Hp, Wp, nh*2*win) compact rel-pos bias factors
    [bias_h | bias_w] per head (zero-padded rows/cols: pad QUERY rows are
    discarded, so their bias is irrelevant; bias columns of valid queries
    are q-dependent only).  Hp/Wp must be multiples of ``win``.
    ``wcp`` = window-columns per program (must divide Wp//win): >1
    amortizes the per-program selector setup and issues one contiguous
    (win, wcp*win, 3C) row-block DMA instead of wcp strided ones.
    Returns (B, Hp, Wp, C).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if flat:
        return _call_window_packed_flat(qkv_pad, bias_pad, win, num_heads,
                                        float(scale), interpret)
    return _call_window_packed(qkv_pad, bias_pad, win, num_heads,
                               float(scale), interpret, wcp)

# A head-batched-softmax flat variant (all nh score dots of a window into
# one f32 scratch, ONE whole-buffer softmax, then the PV dots) was built and
# validated in interpret mode in r3 — and REMOVED: on the real chip it was
# no faster (107.7 vs 108.3 ms/batch-8 vit_b encoder), and in bf16 Mosaic
# miscompiled the mixed whole-buffer/sliced scratch access pattern (heads
# 0..nh-3 of window-cols >= 1 read stale probabilities; f32 was bit-equal).
# Per the r2-r4 iteration log, per-(window, head) softmax cost is NOT the
# window kernel's bottleneck — the floor is MXU geometry on (196, 128, 196)
# dots (~2 ms/layer at vit_b), not VPU reductions.


def window_attention_xla_aug(q: jax.Array, k: jax.Array, v: jax.Array,
                             Rh: jax.Array, Rw: jax.Array, win: int,
                             scale: float,
                             heads_first: bool = False) -> jax.Array:
    """Windowed attention as plain XLA batched matmuls over the AUGMENTED
    operands (no Pallas).  The per-window dots are small (196 x 92 x 196),
    so 2400 of them serialize a hand-written kernel's MXU; XLA's batched
    GEMM pipelines them instead, and the bias rides the contraction exactly
    like the kernel path — scores exist only as one bf16 batched
    intermediate, never the reference's f32 5-D broadcast sum
    (image_encoder.py:336-372)."""
    if heads_first:
        nw, nh, sw, d = q.shape
        to_b = lambda x: x
    else:
        nw, sw, nh, d = q.shape
        to_b = lambda x: x.transpose(0, 2, 1, 3)
    assert sw == win * win
    qb, kb, vb = to_b(q), to_b(k), to_b(v)        # (NW, H, S_w, D)
    bias_h, bias_w = _compact_biases(
        qb.reshape(nw * nh, sw, d), Rh, Rw, win, win)
    qs = (qb.astype(jnp.float32) * scale).astype(qb.dtype)
    q_aug = jnp.concatenate(
        [qs, bias_h.reshape(nw, nh, sw, win).astype(qb.dtype),
         bias_w.reshape(nw, nh, sw, win).astype(qb.dtype)], axis=-1)
    sel = jnp.asarray(_selectors_np(win, win), qb.dtype)
    k_aug = jnp.concatenate(
        [kb, jnp.broadcast_to(sel[None, None], (nw, nh) + sel.shape)],
        axis=-1)
    scores = jnp.einsum("whqc,whkc->whqk", q_aug, k_aug,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores, axis=-1).astype(vb.dtype)
    out = jnp.einsum("whqk,whkd->whqd", p, vb,
                     preferred_element_type=jnp.float32).astype(vb.dtype)
    return out if heads_first else out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("win", "interpret",
                                             "per_head_grid", "wpp"))
def _call_window(q_aug, k_aug, v, win, interpret, per_head_grid=False,
                 wpp=1):
    nw, nh, sw, da = q_aug.shape
    d = v.shape[-1]
    if wpp > 1:
        assert nw % wpp == 0 and not per_head_grid
        fold2 = lambda x: x.reshape(nw // wpp, wpp * nh * sw, x.shape[-1])
        spec2 = lambda last: pl.BlockSpec((1, wpp * nh * sw, last),
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM)
        kernel = functools.partial(_window_aug_loop_kernel,
                                   heads=wpp * nh, sw=sw)
        out = pl.pallas_call(
            kernel,
            grid=(nw // wpp,),
            in_specs=[spec2(da), spec2(da), spec2(d)],
            out_specs=spec2(d),
            out_shape=jax.ShapeDtypeStruct((nw // wpp, wpp * nh * sw, d),
                                           v.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(fold2(q_aug), fold2(k_aug), fold2(v))
        return out.reshape(nw, nh, sw, d)
    if per_head_grid:
        spec = lambda last: pl.BlockSpec((1, 1, sw, last),
                                         lambda i, j: (i, j, 0, 0),
                                         memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _window_aug_kernel,
            grid=(nw, nh),
            in_specs=[spec(da), spec(da), spec(d)],
            out_specs=spec(d),
            out_shape=jax.ShapeDtypeStruct((nw, nh, sw, d), v.dtype),
            interpret=interpret,
        )(q_aug, k_aug, v)

    fold = lambda x: x.reshape(nw, nh * sw, x.shape[-1])
    spec = lambda last: pl.BlockSpec((1, nh * sw, last),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = functools.partial(_window_aug_loop_kernel, heads=nh, sw=sw)
    out = pl.pallas_call(
        kernel,
        grid=(nw,),
        in_specs=[spec(da), spec(da), spec(d)],
        out_specs=spec(d),
        out_shape=jax.ShapeDtypeStruct((nw, nh * sw, d), v.dtype),
        interpret=interpret,
    )(fold(q_aug), fold(k_aug), fold(v))
    return out.reshape(nw, nh, sw, d)
