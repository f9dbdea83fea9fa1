"""Attention dispatch: fused Pallas flash attention on TPU, einsum fallback.

The encoders' unmasked softmax attention materializes (B, H, S, S) matrices
under plain XLA — at DINOv2-L's 2305 tokens that is ~170 MB/layer/image of
HBM traffic, the dominant pipeline cost.  On TPU we route to the Pallas
flash-attention kernel (jax.experimental.pallas.ops.tpu.flash_attention),
padding the sequence to a block multiple with segment-id masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
