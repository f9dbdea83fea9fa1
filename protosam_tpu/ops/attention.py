"""Attention dispatch: fused Pallas flash attention on TPU, einsum fallback.

The encoders' unmasked softmax attention materializes (B, H, S, S) matrices
under plain XLA — at DINOv2-L's 2305 tokens that is ~170 MB/layer/image of
HBM traffic, the dominant pipeline cost.  On TPU we route to the Pallas
flash-attention kernel (jax.experimental.pallas.ops.tpu.flash_attention),
padding the sequence to a block multiple with segment-id masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def flash_available() -> bool:
    platform = jax.default_backend()
    return platform in ("tpu", "axon")


def _einsum_mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
                scale: float) -> jax.Array:
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pad_to(x: jax.Array, axis: int, size: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def multi_head_attention_bhsd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                              scale: float, n_valid: int | None = None,
                              use_flash: str | bool = "auto") -> jax.Array:
    """Unmasked MHA in flash-native layout.  q/k/v: (B, H, S, D).

    ``n_valid``: tokens at index >= n_valid are sequence PADDING (the
    caller pads once before the layer stack instead of per-layer —
    attention must mask the padded keys; padded query rows produce junk
    that the caller slices off).  The einsum path masks with -inf; the
    flash path uses segment ids.  S should be a flash block multiple.
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
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        b, nh, s, d = q.shape
        block = 512 if s >= 512 else 128
        s_pad = -(-s // block) * block
        nv = n_valid if n_valid is not None else s
        if s_pad != s:
            # caller didn't pre-pad (small/irregular sequences): pad here
            widths = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
            q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
        seg = None
        if nv < s_pad:
            ids = (jnp.arange(s_pad) < nv).astype(jnp.int32)[None]
            ids = jnp.broadcast_to(ids, (b, s_pad))
            seg = SegmentIds(q=ids, kv=ids)
        # block_q = the FULL sequence when the f32 score block fits VMEM:
        # v5e sweep at DINOv2-L's (8,16,2560,64) measured 137 TF/s for
        # (2560, 512) blocks vs 68 TF/s for (512, 512)
        # (tools/bench_dino_flash.py)
        bq = s_pad if s_pad * block * 4 <= 8 * 1024 * 1024 else block
        bs = BlockSizes(
            block_q=bq, block_k_major=block, block_k=block, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=block,
            block_k_dkv=block, block_q_dkv=bq,
            block_k_major_dq=block, block_k_dq=block, block_q_dq=bq,
        )
        out = flash_attention(q, k, v, segment_ids=seg, sm_scale=scale,
                              block_sizes=bs)
        return out[:, :, :s].astype(q.dtype)

    if use_flash == "auto":
        return jax.lax.platform_dependent(q, k, v, cpu=einsum_path,
                                          default=flash_path)
    return flash_path(q, k, v) if use_flash else einsum_path(q, k, v)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         scale: float, use_flash: str | bool = "auto"
                         ) -> jax.Array:
    """Unmasked MHA.  q/k/v: (B, S, H, D) -> (B, S, H, D).

    use_flash: True / False / "auto".  "auto" resolves per *lowering
    platform* (jax.lax.platform_dependent): the flash kernel on TPU, the
    einsum path on CPU — so one traced program both inits on a CPU device
    and runs flash on the chip.
    """
    if use_flash == "auto":
        return jax.lax.platform_dependent(
            q, k, v,
            cpu=functools.partial(_einsum_mha, scale=scale),
            default=functools.partial(_flash_mha, scale=scale))

    if not use_flash:
        return _einsum_mha(q, k, v, scale=scale)
    return _flash_mha(q, k, v, scale=scale)


def _flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
               scale: float) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, d = q.shape
    block = 512 if s >= 512 else 128
    s_pad = -(-s // block) * block

    def to_bhsd(x):
        return _pad_to(x.transpose(0, 2, 1, 3), 2, s_pad)

    qp, kp, vp = to_bhsd(q), to_bhsd(k), to_bhsd(v)
    seg = None
    if s_pad != s:
        ids = (jnp.arange(s_pad) < s).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (b, s_pad))
        seg = SegmentIds(q=ids, kv=ids)

    bs = BlockSizes(
        block_q=min(block, s_pad), block_k_major=min(block, s_pad),
        block_k=min(block, s_pad), block_b=1,
        block_q_major_dkv=min(block, s_pad),
        block_k_major_dkv=min(block, s_pad),
        block_k_dkv=min(block, s_pad), block_q_dkv=min(block, s_pad),
        block_k_major_dq=min(block, s_pad), block_k_dq=min(block, s_pad),
        block_q_dq=min(block, s_pad),
    )
    out = flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale,
                          block_sizes=bs)
    return out[:, :, :s].transpose(0, 2, 1, 3).astype(q.dtype)
