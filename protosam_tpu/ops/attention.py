"""Attention dispatch: fused Pallas flash attention on TPU, einsum fallback.

The encoders' unmasked softmax attention materializes (B, H, S, S) matrices
under plain XLA — at DINOv2-L's 2305 tokens that is ~170 MB/layer/image of
HBM traffic, the dominant pipeline cost.  On TPU we route to a purpose-built
one-pass Pallas kernel: one program handles a block of query rows against
the FULL key set (the f32 score block lives in VMEM), with key padding
masked by an in-kernel iota compare.

History: r1-r2 used the stock pallas flash_attention with SegmentIds for
the pad mask; the r2 device trace showed the segment-id path costs 2.6x
(3.29 ms/layer vs 1.27 unmasked at DINOv2-L's (8,16,2560,64) on v5e), so
the masked one-pass kernel below replaced it — same shape as the proven
ViTDet global kernel (ops/vitdet_flash._aug_kernel, ~87 TF/s).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _masked_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, n_valid):
    """One (batch*head, q-block) program: scores = <q,k> * scale with key
    columns >= n_valid masked to -inf BEFORE the one-pass softmax.

    q_ref: (1, blk, D); k_ref/v_ref: (1, S, D); out_ref: (1, blk, D).
    """
    scores = lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (blk, S)
    scores = scores * scale
    if n_valid is not None:
        cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols >= n_valid, -jnp.inf, scores)
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


@functools.partial(jax.jit, static_argnames=("scale", "n_valid", "blk_q",
                                             "interpret"))
def _masked_flash(q, k, v, scale, n_valid, blk_q, interpret):
    b, nh, s, d = q.shape
    fold = lambda x: x.reshape(b * nh, s, d)
    out = pl.pallas_call(
        functools.partial(_masked_kernel, scale=scale, n_valid=n_valid),
        grid=(b * nh, s // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nh, s, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(b, nh, s, d)


def masked_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                           scale: float, n_valid: int | None = None,
                           blk_q: int | None = None,
                           interpret: bool | None = None) -> jax.Array:
    """One-pass masked flash MHA.  q/k/v: (B, H, S, D); S must be a
    multiple of ``blk_q`` (callers pad once before the layer stack); keys
    at index >= ``n_valid`` are excluded from the softmax.

    ``blk_q=None`` auto-selects: the FULL sequence when the f32 score
    block fits comfortably in VMEM (v5e sweep at DINOv2-L 672px:
    S=2432 full-seq 0.99 ms/layer-batch8 vs 1.51 at 128-row blocks and
    1.33 for the stock segid kernel at S=2560), else 512/128-row blocks."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    s = q.shape[2]
    if blk_q is None:
        if s * s * 4 <= 26 * 1024 * 1024:
            blk_q = s
        elif s % 512 == 0:
            blk_q = 512
        else:
            blk_q = 128
    if s % blk_q:
        blk_q = 128 if s % 128 == 0 else s
    if n_valid is not None and n_valid >= s:
        n_valid = None
    return _masked_flash(q, k, v, float(scale), n_valid, blk_q, interpret)


def _packed_kernel(qkv_ref, out_ref, *, scale, n_valid, nh, hd):
    """One program per batch element: the (S, 3C) qkv block stays resident
    in VMEM and heads run inside a ``fori_loop`` of dynamic lane slices —
    q_h = qkv[:, h*hd:(h+1)*hd], k_h at C + ..., v_h at 2C + ... (the
    (3, nh, hd) channel order of the fused qkv projection).  No (B,H,S,D)
    intermediate ever exists in HBM.

    Two heads per loop step keep the dynamic lane offsets 128-aligned
    (hd=64 everywhere in this repo's ViTs); a python-unrolled head loop
    kept every head's (S, S) softmax temporaries live — 178 MB of Mosaic
    register spill at DINOv2-L (the same liveness failure as the CCA
    kernel's unrolled scans, ops/cca_pallas.py)."""
    s = qkv_ref.shape[1]
    c = nh * hd

    def one_head(q, k, v):
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (S, S)
        if n_valid is not None:
            cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols >= n_valid, -jnp.inf, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc / l).astype(out_ref.dtype)

    if nh % 2:
        for h in range(nh):  # odd head counts: test-size models only
            q = qkv_ref[0, :, h * hd:(h + 1) * hd]
            k = qkv_ref[0, :, c + h * hd:c + (h + 1) * hd]
            v = qkv_ref[0, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            out_ref[0, :, h * hd:(h + 1) * hd] = one_head(q, k, v)
        return

    def body(j, carry):
        off = j * (2 * hd)
        qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
        kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
        vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
        o0 = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
        o1 = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])
        out_ref[0, :, pl.ds(off, 2 * hd)] = jnp.concatenate([o0, o1], axis=1)
        return carry

    lax.fori_loop(0, nh // 2, body, jnp.int32(0))


def _packed_aug_kernel(qkv_ref, out_ref, qa_ref, ka_ref, va_ref, *,
                       scale, n_valid, nh, hd):
    """Augmented-operand variant of ``_packed_kernel`` — the softmax's
    bookkeeping passes are folded into the two MXU dots, which stay the
    same size (one K-tile / one N-tile either way):

    * scale folds into the q_aug build ((S, hd) elements, ~1/S the cost
      of scaling the (S, S) score matrix; exact when scale is a power of
      two — hd=64 => 1/8 for every model this kernel serves);
    * the pad-key mask folds into the score dot via one augmented K lane:
      q_aug = [q*scale | 1], k_aug = [k | maskbias] with maskbias = -1e30
      on pad rows, so masked scores exp to exactly 0 (K=hd+1 <= 128 is
      still one MXU K-tile — the mask costs zero MXU time);
    * the softmax row-sum folds into the PV dot via a ones lane on v:
      acc_aug = p @ [v | 1] yields the weighted sum AND the normalizer
      (N=hd+1 <= 128 is still one N-tile).

    Per (S, S) block the VPU then runs only max and sub+exp — measured
    1.34 ms/call vs 2.03 for the plain kernel at DINOv2-L's
    (8, 2432, 3*1024) bf16 geometry (tools/microbench_attn.py; bit-equal
    there, and within ~1 ulp of the plain kernel in f32 — the row-sum
    accumulates on the MXU in tree order instead of the VPU's sequential
    order).  Requires hd + 1 <= 128 and even ``nh``.
    """
    c = nh * hd

    def one_head(q, k, v):
        qa_ref[:, :hd] = (q.astype(jnp.float32) * scale).astype(qa_ref.dtype)
        qa_ref[:, hd:hd + 1] = jnp.ones((q.shape[0], 1), qa_ref.dtype)
        ka_ref[:, :hd] = k
        if n_valid is not None:
            rows = lax.broadcasted_iota(jnp.int32, (k.shape[0], 1), 0)
            ka_ref[:, hd:hd + 1] = jnp.where(
                rows >= n_valid, jnp.asarray(-1e30, jnp.float32), 0.0
            ).astype(ka_ref.dtype)
        else:
            ka_ref[:, hd:hd + 1] = jnp.zeros((k.shape[0], 1), ka_ref.dtype)
        scores = lax.dot_general(
            qa_ref[...], ka_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (S, S) masked
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        va_ref[:, :hd] = v
        va_ref[:, hd:hd + 1] = jnp.ones((v.shape[0], 1), va_ref.dtype)
        acc = lax.dot_general(
            p, va_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (S, hd+1)
        return (acc[:, :hd] / acc[:, hd:hd + 1]).astype(out_ref.dtype)

    def body(j, carry):
        off = j * (2 * hd)
        qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
        kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
        vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
        o0 = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
        o1 = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])
        out_ref[0, :, pl.ds(off, 2 * hd)] = jnp.concatenate([o0, o1], axis=1)
        return carry

    lax.fori_loop(0, nh // 2, body, jnp.int32(0))


def _packed_grid_kernel(qkv_ref, out_ref, *, scale, n_valid, nh, hd):
    """Head-pair-per-PROGRAM variant of ``_packed_kernel``: the head loop
    moves into the pallas grid.  The qkv input block's index map is
    CONSTANT across the head axis, so Mosaic keeps the (S, 3C) block
    resident — no re-DMA per pair — while the per-program output block is
    a disjoint 128-lane slice.  Breaking the fori_loop's serial
    scratch-free chain into independent programs lets the scheduler
    overlap program j's softmax (VPU) with j+1's score dot (MXU)."""
    c = nh * hd
    j = pl.program_id(1)
    off = j * (2 * hd)

    def one_head(q, k, v):
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (S, S)
        if n_valid is not None:
            cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols >= n_valid, -jnp.inf, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        acc = lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc / l).astype(out_ref.dtype)

    qq = qkv_ref[0, :, pl.ds(off, 2 * hd)]
    kk = qkv_ref[0, :, pl.ds(c + off, 2 * hd)]
    vv = qkv_ref[0, :, pl.ds(2 * c + off, 2 * hd)]
    out_ref[0, :, :hd] = one_head(qq[:, :hd], kk[:, :hd], vv[:, :hd])
    out_ref[0, :, hd:] = one_head(qq[:, hd:], kk[:, hd:], vv[:, hd:])


@functools.partial(jax.jit, static_argnames=("scale", "n_valid", "nh",
                                             "interpret", "head_grid",
                                             "aug"))
def _masked_flash_packed(qkv, scale, n_valid, nh, interpret,
                         head_grid=False, aug=True):
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    if aug and nh % 2 == 0 and hd + 1 <= 128 and not head_grid:
        return pl.pallas_call(
            functools.partial(_packed_aug_kernel, scale=scale,
                              n_valid=n_valid, nh=nh, hd=hd),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
            scratch_shapes=[pltpu.VMEM((s, hd + 1), qkv.dtype),
                            pltpu.VMEM((s, hd + 1), qkv.dtype),
                            pltpu.VMEM((s, hd + 1), qkv.dtype)],
            # f32 STRICT-path inputs at DINOv2-L (S=2432): the (S, 3C) f32
            # block + f32 score temporaries reach ~109 MB of scoped VMEM —
            # over the usual 100 MB margin but comfortably inside the
            # v5e's 128 MB (verified on chip by the f32 drift run)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=118 * 1024 * 1024),
            interpret=interpret,
        )(qkv)
    if head_grid and nh % 2 == 0:
        return pl.pallas_call(
            functools.partial(_packed_grid_kernel, scale=scale,
                              n_valid=n_valid, nh=nh, hd=hd),
            grid=(b, nh // 2),
            in_specs=[pl.BlockSpec((1, s, c3), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, s, 2 * hd), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(qkv)
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, n_valid=n_valid,
                          nh=nh, hd=hd),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv)


def _packed_math(qkv, scale, n_valid, nh):
    """Reference math of the packed kernel as plain XLA, chunked per head
    so the (S, S) matrices stay bounded — used ONLY to derive the backward
    pass (jax.vjp of this function), since pallas_call has no autodiff
    rule.  Forward stays on the kernel."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    q5 = qkv.reshape(b, s, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = q5[0], q5[1], q5[2]        # (B, nh, S, hd)

    def one_head(args):
        qh, kh, vh = args                 # (B, S, hd)
        attn = jnp.einsum("bqd,bkd->bqk", qh * scale, kh,
                          preferred_element_type=jnp.float32)
        if n_valid is not None:
            mask = jnp.arange(s) >= n_valid
            attn = jnp.where(mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        return jnp.einsum("bqk,bkd->bqd", attn, vh,
                          preferred_element_type=jnp.float32).astype(vh.dtype)

    out = lax.map(one_head, (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
                             v.transpose(1, 0, 2, 3)))   # (nh, B, S, hd)
    return out.transpose(1, 2, 0, 3).reshape(b, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _packed_attn(qkv, scale, n_valid, nh, interpret, head_grid, aug):
    return _masked_flash_packed(qkv, scale, n_valid, nh, interpret,
                                head_grid, aug)


def _packed_attn_fwd(qkv, scale, n_valid, nh, interpret, head_grid, aug):
    return _packed_attn(qkv, scale, n_valid, nh, interpret, head_grid,
                        aug), qkv


def _packed_attn_bwd(scale, n_valid, nh, interpret, head_grid, aug, qkv, g):
    _, vjp = jax.vjp(lambda t: _packed_math(t, scale, n_valid, nh), qkv)
    return vjp(g)


_packed_attn.defvjp(_packed_attn_fwd, _packed_attn_bwd)


def masked_flash_attention_packed(qkv: jax.Array, *, scale: float,
                                  num_heads: int,
                                  n_valid: int | None = None,
                                  interpret: bool | None = None,
                                  head_grid: bool | None = None
                                  ) -> jax.Array:
    """Packed-layout masked flash MHA.

    qkv: (B, S, 3*C) straight from the fused qkv projection (channel order
    (3, heads, head_dim)); returns (B, S, C) ready for the output
    projection.  Keys at index >= n_valid are excluded from the softmax.
    Differentiable: the backward pass is the VJP of a per-head-chunked
    einsum recomputation (training/TTT drive this under jax.grad).

    ``head_grid`` moves the head-pair loop into the pallas grid (constant
    input index map — one DMA per batch element, disjoint 128-lane output
    blocks); env ``PTPU_PACKED_HEAD_GRID=1`` flips the default for A/B.
    The augmented-operand kernel (mask/scale/row-sum folded into the MXU
    dots; bit-identical at power-of-two scales, 1.34 vs 2.03 ms at the
    DINOv2-L geometry) is the default; ``PTPU_PACKED_AUG=0`` reverts to
    the serial baseline kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if head_grid is None:
        head_grid = os.environ.get("PTPU_PACKED_HEAD_GRID", "0") == "1"
    aug = os.environ.get("PTPU_PACKED_AUG", "1") == "1"
    s = qkv.shape[1]
    if n_valid is not None and n_valid >= s:
        n_valid = None
    return _packed_attn(qkv, float(scale), n_valid, num_heads, interpret,
                        bool(head_grid), aug)


def multi_head_attention_bhsd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                              scale: float, n_valid: int | None = None,
                              use_flash: str | bool = "auto") -> jax.Array:
    """Unmasked MHA in flash-native layout.  q/k/v: (B, H, S, D).

    ``n_valid``: tokens at index >= n_valid are sequence PADDING (the
    caller pads once before the layer stack instead of per-layer —
    attention must mask the padded keys; padded query rows produce junk
    that the caller slices off).  Both paths mask with -inf before the
    softmax.  S should be a multiple of the 512 query block (the kernel
    falls back to 128-row blocks otherwise).
    """
    if n_valid is not None and n_valid >= q.shape[2]:
        n_valid = None

    def einsum_path(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        if n_valid is not None:
            mask = jnp.arange(attn.shape[-1]) >= n_valid
            attn = jnp.where(mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def flash_path(q, k, v):
        return masked_flash_attention(q, k, v, scale=scale, n_valid=n_valid,
                                      interpret=False)

    if use_flash == "auto":
        return jax.lax.platform_dependent(q, k, v, cpu=einsum_path,
                                          default=flash_path)
    return flash_path(q, k, v) if use_flash else einsum_path(q, k, v)
