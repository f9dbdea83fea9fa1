"""Flash attention with decomposed relative-position bias (ViTDet global
blocks), as a Pallas kernel.

SAM's 4 global-attention layers are the one attention family the stock
flash kernel can't serve: their bias
``attn[q,k] += <q, Rh[qh,kh]> + <q, Rw[qw,kw]>``
(reference image_encoder.py:336-372) depends on the query vector, so
materializing it costs the same HBM traffic as the attention matrix itself
(the current fallback is query-chunked attention, ops described in
models/sam/image_encoder.py).  This kernel computes the bias on the fly
per (q-block, k-block) tile from the small (H, H, D)/(W, W, D) tables and
runs streaming softmax, so nothing quadratic ever leaves VMEM.

Block layout: query and key blocks are whole grid ROWS (R rows × W cols per
block), so inside a tile

  bias_h[qr, qw, kr, kw] = <q[qr, qw], Rh[q0+qr, k0+kr]>   (kw-constant)
  bias_w[qr, qw, kr, kw] = <q[qr, qw], Rw[qw, kw]>         (kr-constant)

both reduce to small einsums against table slices.

Status: verified against the einsum reference in interpret mode
(tests/test_vitdet_flash.py); enable on hardware via
``Attention(use_flash_relpos=True)`` after tools/tpu_suite.py validates it
on the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *, rows_per_blk,
            grid_w, scale):
    """One (batch*head, q-block) program: stream over k-blocks.

    q_ref: (R*W, D); k_ref/v_ref: (S, D) full; rh_ref: (H, H, D);
    rw_ref: (W, W, D); out_ref: (R*W, D).
    """
    qb = pl.program_id(1)
    r, w = rows_per_blk, grid_w
    d = q_ref.shape[-1]
    s = k_ref.shape[1]
    n_kblk = s // (r * w)

    q = q_ref[0].astype(jnp.float32)             # (R*W, D)
    q4 = q.reshape(r, w, d)

    # bias_w: (qr, qw, kw) = <q[qr, qw], Rw[qw, kw]> — k-block independent
    rw = rw_ref[:].astype(jnp.float32)           # (W, W, D)
    bias_w = jax.lax.dot_general(
        q4.transpose(1, 0, 2), rw.transpose(0, 2, 1),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (W=qw, R=qr, W=kw)
    bias_w = bias_w.transpose(1, 0, 2)           # (qr, qw, kw)

    m = jnp.full((r * w, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((r * w, 1), jnp.float32)
    acc = jnp.zeros((r * w, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * r * w, r * w), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * r * w, r * w), :].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q * scale, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (R*W, R*W)

        # bias_h: (qr, qw, kr) = <q[qr, qw], Rh[q0+qr, k0+kr]>
        rh_blk = jax.lax.dynamic_slice(
            rh_ref[:], (qb * r, kb * r, 0), (r, r, d)
        ).astype(jnp.float32)                    # (Rq, Rk, D)
        bias_h = jax.lax.dot_general(
            q4, rh_blk.transpose(0, 2, 1),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (qr, qw, kr)

        sc = scores.reshape(r, w, r, w)
        sc = sc + bias_h[:, :, :, None] + bias_w[:, :, None, :]
        scores = sc.reshape(r * w, r * w)

        m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kblk, body, (m, l, acc))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def flash_attention_relpos(q: jax.Array, k: jax.Array, v: jax.Array,
                           Rh: jax.Array, Rw: jax.Array, grid_hw,
                           scale: float, rows_per_blk: int = 2,
                           interpret: bool | None = None) -> jax.Array:
    """q/k/v: (B, S, heads, D) with S = H*W; Rh: (H, H, D); Rw: (W, W, D).

    Returns (B, S, heads, D).  rows_per_blk * W is the tile side; H must be
    divisible by rows_per_blk.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = grid_hw
    b, s, nh, d = q.shape
    assert s == h * w and h % rows_per_blk == 0

    def to_bh(x):  # (B, S, nh, D) -> (B*nh, S, D)
        return x.transpose(0, 2, 1, 3).reshape(b * nh, s, d)

    out = _call(to_bh(q), to_bh(k), to_bh(v), Rh, Rw, rows_per_blk, w,
                scale, interpret)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_blk", "grid_w", "scale",
                                    "interpret"))
def _call(q, k, v, rh, rw, rows_per_blk, grid_w, scale, interpret):
    bh, s, d = q.shape
    blk = rows_per_blk * grid_w
    kernel = functools.partial(_kernel, rows_per_blk=rows_per_blk,
                               grid_w=grid_w, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rh.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rw.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rh, rw)
