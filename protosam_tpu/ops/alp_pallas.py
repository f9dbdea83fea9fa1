"""Fused Pallas kernel for ALP prototype matching — the north-star kernel.

Fuses, for each query-pixel tile held in VMEM: L2 normalization, the
prototype similarity matmul (MXU), the validity-masked softmax over
prototypes, and the softmax-weighted aggregation — one HBM read of the
query features and one write of the score map, instead of materializing the
(N, P, H, W) distance tensor (reference models/alpmodule.py:67-77 runs
conv2d + softmax + mul + sum as four separate CUDA kernels).

Shapes are padded to hardware tiles: P (prototype count) to a lane multiple
of 128, HW to the row-tile size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from protosam_tpu.ops.norm import safe_l2_normalize

NEG_INF = -1e10
SIM_SCALE = 20.0
_ROW_TILE = 256


def _kernel(q_ref, pn_ref, valid_ref, out_ref):
    """q_ref (T, C) raw query features; pn_ref (P, C) normalized prototypes;
    valid_ref (1, P) {0,1}; out_ref (T, 1) aggregated scores."""
    q = q_ref[:].astype(jnp.float32)
    # safe_norm over channels: x / max(||x||, 1e-4) == x * rsqrt(max(n2, 1e-8))
    n2 = jnp.sum(q * q, axis=1, keepdims=True)
    qn = q * jax.lax.rsqrt(jnp.maximum(n2, 1e-8))

    dists = SIM_SCALE * jnp.dot(qn, pn_ref[:].astype(jnp.float32).T,
                                preferred_element_type=jnp.float32)  # (T, P)
    valid = valid_ref[0, :] > 0
    masked = jnp.where(valid[None, :], dists, NEG_INF)
    m = jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    out_ref[:] = jnp.sum(w * jnp.where(valid[None, :], dists, 0.0), axis=1,
                         keepdims=True)


def alp_match_fused(qry_fts: jax.Array, protos: jax.Array, valid: jax.Array,
                    interpret: bool | None = None) -> jax.Array:
    """Public entry: compiled kernel on TPU, interpreter elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _alp_match_fused(qry_fts, protos, valid, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _alp_match_fused(qry_fts: jax.Array, protos: jax.Array, valid: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Fused ALP matching.

    qry_fts (N, C, H, W) raw features; protos (P, C) raw prototypes;
    valid (P,) bool.  Returns (N, 1, H, W) — identical numerics to
    ops.alp.score_prototypes.
    """
    n, c, h, w = qry_fts.shape
    p = protos.shape[0]

    pn = safe_l2_normalize(protos.astype(jnp.float32), axis=1)
    p_pad = -(-p // 128) * 128
    if p_pad != p:
        pn = jnp.pad(pn, ((0, p_pad - p), (0, 0)))
        valid = jnp.pad(valid, (0, p_pad - p))
    vrow = valid.astype(jnp.float32)[None, :]

    q = qry_fts.astype(jnp.float32).transpose(0, 2, 3, 1).reshape(-1, c)
    hw = q.shape[0]
    hw_pad = -(-hw // _ROW_TILE) * _ROW_TILE
    if hw_pad != hw:
        q = jnp.pad(q, ((0, hw_pad - hw), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(hw_pad // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw_pad, 1), jnp.float32),
        interpret=interpret,
    )(q, pn, vrow)

    return out[:hw, 0].reshape(n, h, w)[:, None]
