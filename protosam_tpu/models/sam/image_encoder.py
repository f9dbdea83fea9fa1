"""SAM image encoder (ViTDet) in flax, NHWC, fixed shapes.

Re-implements the behavior of reference
models/segment_anything/modeling/image_encoder.py (ImageEncoderViT:17-122,
Block:125-193, Attention:196-251, window partition:254-300, decomposed
relative positions:303-372, PatchEmbed:375-406) as a TPU-first design:

* the transformer stack runs as ONE ``nn.scan`` over stacked per-layer
  params (windowed vs global attention selected per layer by ``lax.cond``),
  so XLA traces a single block instead of depth× copies — compile time on
  the remote TPU toolchain drops from tens of minutes to minutes for
  ViT-H;
* rel-pos tables are stored padded to the global size (the converter pads
  the windowed layers' 27-row tables), sliced per layer;
* global attention is computed in sequential query-row chunks so the
  (B, heads, 4096, 4096) matrices never materialize.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from protosam_tpu.models.layers import (
    LayerNorm2d,
    MLPBlock,
    TokenLayerNorm,
)

def _gelu(x):
    """Exact erf GELU on TPU lowers to a multi-fusion f32 erfc with
    bit-packed sign predicates (~70 ms/batch-8 across both encoders in the
    r2 device trace); the tanh approximation's max error (5e-4) is 30x
    below the bf16 quantization noise floor (1.6e-2), so the bf16
    production path uses it.  float32 -- the strict-parity dtype
    (PARITY.md) -- keeps exact erf."""
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def window_partition(x: jax.Array, window: int) -> tuple[jax.Array, tuple[int, int]]:
    """[B, H, W, C] -> [B*nw, window, window, C] with zero padding."""
    b, h, w, c = x.shape
    ph, pw = (-h) % window, (-w) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, window: int, pad_hw: tuple[int, int],
                       hw: tuple[int, int]) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _interp_rel_pos(rel_pos: jax.Array, target_len: int) -> jax.Array:
    """Linear 1-D interpolation of the rel-pos table to 2*size-1 rows
    (reference image_encoder.py:315-326; align_corners=False)."""
    if rel_pos.shape[0] == target_len:
        return rel_pos
    return jax.image.resize(rel_pos, (target_len, rel_pos.shape[1]),
                            method="linear", antialias=False)


def _rel_pos_table(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """R[q, k, c] lookup table (reference get_rel_pos, image_encoder.py:303-333)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel = _interp_rel_pos(rel_pos, max_rel_dist)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[jnp.asarray(relative.astype(np.int64))]


def _attend(q_rows, k, v, Rh_rows, Rw, num_heads, scale, grid_hw,
            use_rel_pos, dtype):
    """Attention for a block of query rows against the full key set.

    q_rows (B, ch, W, heads, hd); k/v (B, H*W, heads, hd);
    Rh_rows (ch, H, hd); Rw (W, W, hd).  Returns (B, ch*W, heads, hd).
    """
    b = q_rows.shape[0]
    ch, w = q_rows.shape[1], q_rows.shape[2]
    h = grid_hw[0]
    hd = q_rows.shape[-1]
    qf = q_rows.reshape(b, ch * w, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qf * scale, k,
                      preferred_element_type=jnp.float32)
    if use_rel_pos:
        bias_h = jnp.einsum("bhwnc,hkc->bnhwk", q_rows, Rh_rows,
                            preferred_element_type=jnp.float32)
        bias_w = jnp.einsum("bhwnc,wkc->bnhwk", q_rows, Rw,
                            preferred_element_type=jnp.float32)
        attn = (attn.reshape(b, num_heads, ch, w, h, w)
                + bias_h[..., None] + bias_w[..., None, :]
                ).reshape(b, num_heads, ch * w, h * w)
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class Attention(nn.Module):
    """Multi-head attention with decomposed relative position bias, owning
    the global-vs-windowed branch (reference Block:125-193 + window
    partition:254-300 choose statically per layer; here ``is_global``
    selects at runtime under one traced block).

    The qkv/proj projections run ONCE on the full grid outside the branch
    (the reference projects per window, taxing qkv/proj with the 70²/64²
    partition padding); the windowed branch feeds the raw padded (B,Hp,Wp,
    3C) projection to a packed Pallas kernel whose window partition is pure
    BlockSpec indexing — the r2 trace measured ~5.5 ms/layer-batch8 of
    partition/layout/augment copies around the per-window kernel, all of
    which this removes.

    ``table_rows`` fixes the stored rel-pos param size (padded to the
    largest grid when stacked under scan); the used slice is 2*size-1.
    """

    num_heads: int
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32
    table_rows: int | None = None
    q_chunk_rows: int = 8   # row-chunk size for grids with >= 2048 tokens
    use_flash_relpos: bool = False
    # query grid-rows per global-kernel program (v5e sweep; env override
    # PTPU_FLASH_Q_ROWS for on-chip A/B without a rebuild)
    flash_q_rows: int = int(os.environ.get("PTPU_FLASH_Q_ROWS", "16"))
    # "packed" (BlockSpec-partition kernel) | "flash" (per-window kernel on
    # partitioned tensors) | "xla_aug" (no pallas); non-packed backends are
    # kept for A/B and measurement history (ROUND_NOTES.md)
    window_backend: str = "packed_flat"
    window_wpp: int = 1  # windows per pallas program ("flash" backend)
    window_wcp: int = 0  # window-cols per program; 0 = auto (full row)
    window_size: int = 14
    global_backend: str = "packed"  # "packed" | "flash" (heads-first aug)
    # int8 MXU path for qkv/proj (ops/quant; drift-gated opt-in)
    quant_dense: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, is_global=None,
                 residual: jax.Array | None = None) -> jax.Array:
        from protosam_tpu.ops.quant import dense_cls

        Dense = dense_cls(self.quant_dense)
        b, h, w, c = x.shape
        nh = self.num_heads
        head_dim = c // nh
        scale = head_dim ** -0.5
        win = self.window_size

        qkv_dense = Dense(3 * c, dtype=self.dtype, name="qkv")
        qkv = qkv_dense(x)                           # (B, H, W, 3C)
        qkv_bias = qkv_dense.variables["params"]["bias"].astype(self.dtype)

        if self.use_rel_pos:
            rows = self.table_rows or (2 * max(h, w) - 1)
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (rows, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (rows, head_dim))
            Rh = _rel_pos_table(rel_h[:2 * h - 1].astype(self.dtype), h, h)
            Rw = _rel_pos_table(rel_w[:2 * w - 1].astype(self.dtype), w, w)
            Rh_win = _rel_pos_table(rel_h[:2 * win - 1].astype(self.dtype),
                                    win, win)
            Rw_win = _rel_pos_table(rel_w[:2 * win - 1].astype(self.dtype),
                                    win, win)
        else:
            Rh = Rw = Rh_win = Rw_win = None

        def split_heads(qkv):
            q5 = qkv.reshape(b, h * w, 3, nh, head_dim)
            q5 = q5.transpose(2, 0, 3, 1, 4)         # (3, B, nh, S, hd)
            return q5[0], q5[1], q5[2]

        def chunked(qkv):
            q, k, v = split_heads(qkv)
            # CPU/XLA reference path wants (B, S, heads, hd)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            rq = q.reshape(b, h, w, nh, head_dim)
            if h * w >= 2048 and h % self.q_chunk_rows == 0:
                nch = h // self.q_chunk_rows
                rq_c = rq.reshape(b, nch, self.q_chunk_rows, w,
                                  nh, head_dim).transpose(1, 0, 2, 3, 4, 5)
                Rh_c = (Rh.reshape(nch, self.q_chunk_rows, h, head_dim)
                        if self.use_rel_pos else jnp.zeros((nch, 1)))
                out = jax.lax.map(
                    lambda args: _attend(args[0], k, v, args[1], Rw,
                                         nh, scale, (h, w),
                                         self.use_rel_pos, self.dtype),
                    (rq_c, Rh_c))
                out = out.transpose(1, 0, 2, 3, 4)
            else:
                out = _attend(rq, k, v, Rh, Rw, nh, scale,
                              (h, w), self.use_rel_pos, self.dtype)
            return out.reshape(b, h, w, c).astype(self.dtype)

        def flash(qkv):
            from protosam_tpu.ops.vitdet_flash import flash_attention_relpos

            q, k, v = split_heads(qkv)
            out = flash_attention_relpos(
                q, k, v, Rh.astype(jnp.float32), Rw.astype(jnp.float32),
                (h, w), scale, rows_per_blk=self.flash_q_rows,
                interpret=False, heads_first=True)   # (B, nh, S, hd)
            out = out.transpose(0, 2, 1, 3)
            return out.astype(self.dtype).reshape(b, h, w, c)

        def global_packed(qkv):
            from protosam_tpu.ops.vitdet_flash import global_packed_attention

            q_all = qkv[..., :c].reshape(b, h, w, nh, head_dim)
            # einsums land straight in the kernel dtype (f32 accumulation
            # via preferred_element_type — identical to computing f32 and
            # rounding at the end, but the concat/reshape chain moves
            # half the bytes)
            bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all,
                                Rh.astype(q_all.dtype),
                                preferred_element_type=jnp.float32)
            bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all,
                                Rw.astype(q_all.dtype),
                                preferred_element_type=jnp.float32)
            bias = jnp.concatenate([bias_h.astype(qkv.dtype),
                                    bias_w.astype(qkv.dtype)], axis=-1)
            bias = bias.reshape(b, h, w, nh * (h + w))
            return global_packed_attention(
                qkv, bias, nh, scale, rows_per_blk=self.flash_q_rows,
                interpret=False)

        def global_attn(qkv):
            if (self.use_flash_relpos and self.use_rel_pos
                    and h * w >= 2048 and h % self.flash_q_rows == 0):
                tpu = (global_packed if self.global_backend == "packed"
                       else flash)
                return jax.lax.platform_dependent(qkv, cpu=chunked,
                                                  default=tpu)
            return chunked(qkv)

        # ---- windowed branch ------------------------------------------
        ph, pw = (-h) % win, (-w) % win
        hp, wp = h + ph, w + pw

        def pad_qkv(qkv):
            """Window padding AFTER the projection: pad tokens must carry
            Dense(0) = bias (the reference zero-pads x before qkv)."""
            if not (ph or pw):
                return qkv
            # A strip-fill variant (jnp.pad + two narrow
            # dynamic_update_slice writes instead of this whole-tensor
            # where-select) was A/B'd on chip and is a WASH on both
            # encoders (vit_h 492.1 vs 490.3, vit_b 108.7 vs 107.8
            # ms/batch-8) while compiling ~50% slower — the pad_select
            # fusion overlaps; keep the simple select (ROUND_NOTES r3).
            padded = jnp.pad(qkv, ((0, 0), (0, ph), (0, pw), (0, 0)))
            ymask = jnp.arange(hp) < h
            xmask = jnp.arange(wp) < w
            valid = (ymask[:, None] & xmask[None, :])[None, :, :, None]
            return jnp.where(valid, padded, qkv_bias)

        def window_packed(qkv):
            from protosam_tpu.ops.vitdet_flash import window_packed_attention

            q_all = qkv[..., :c].reshape(b, h, w, nh, head_dim)
            if self.use_rel_pos:
                iy = np.arange(h) % win
                ix = np.arange(w) % win
                bias_h = jnp.einsum("byxhc,ykc->byxhk", q_all,
                                    Rh_win.astype(q_all.dtype)[iy],
                                    preferred_element_type=jnp.float32)
                bias_w = jnp.einsum("byxhc,xkc->byxhk", q_all,
                                    Rw_win.astype(q_all.dtype)[ix],
                                    preferred_element_type=jnp.float32)
                bias = jnp.concatenate([bias_h.astype(qkv.dtype),
                                        bias_w.astype(qkv.dtype)], axis=-1)
                bias = bias.reshape(b, h, w, nh * 2 * win)
            else:
                bias = jnp.zeros((b, h, w, nh * 2 * win), qkv.dtype)
            if ph or pw:
                bias = jnp.pad(bias, ((0, 0), (0, ph), (0, pw), (0, 0)))
            # wcp=0 -> auto: largest divisor of the window-column count
            # whose qkv block stays under ~8 MB of VMEM (on-chip A/B:
            # full-row programs beat one-window programs, 153.5 vs
            # 156.6 ms/batch-8 on the vit_b encoder)
            nwx = wp // win
            wcp = self.window_wcp
            if wcp == 0:
                wcp = max(d for d in range(1, nwx + 1) if nwx % d == 0
                          and win * win * d * 3 * c * 2 <= 8 * 2 ** 20)
            out = window_packed_attention(pad_qkv(qkv), bias, win, nh,
                                          scale, interpret=False, wcp=wcp,
                                          flat=self.window_backend
                                          == "packed_flat")
            return out[:, :h, :w]

        def partition_windows(qkv):
            ww, _ = window_partition(pad_qkv(qkv), win)   # (NW, win, win, 3C)
            nw = ww.shape[0]
            q5 = ww.reshape(nw, win * win, 3, nh, head_dim)
            q5 = q5.transpose(2, 0, 3, 1, 4)              # (3, NW, nh, Sw, hd)
            return q5[0], q5[1], q5[2], nw

        def window_kernel(qkv):
            from protosam_tpu.ops.vitdet_flash import (
                window_attention_xla_aug,
                window_flash_attention,
            )

            q, k, v, nw = partition_windows(qkv)
            if self.window_backend == "xla_aug":
                out = window_attention_xla_aug(
                    q, k, v, Rh_win.astype(jnp.float32),
                    Rw_win.astype(jnp.float32), win, scale, heads_first=True)
            else:
                out = window_flash_attention(
                    q, k, v, Rh_win.astype(jnp.float32),
                    Rw_win.astype(jnp.float32), win, scale, interpret=False,
                    heads_first=True, wpp=self.window_wpp)
            out = out.transpose(0, 2, 1, 3).reshape(nw, win, win, c)
            return window_unpartition(out, win, (hp, wp),
                                      (h, w)).astype(self.dtype)

        def window_chunked(qkv):
            q, k, v, nw = partition_windows(qkv)
            rq = q.transpose(0, 2, 1, 3).reshape(nw, win, win, nh, head_dim)
            out = _attend(rq, k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3), Rh_win, Rw_win, nh,
                          scale, (win, win), self.use_rel_pos, self.dtype)
            out = out.reshape(nw, win, win, c)
            return window_unpartition(out, win, (hp, wp),
                                      (h, w)).astype(self.dtype)

        def window_attn(qkv):
            if not self.use_flash_relpos:
                return window_chunked(qkv)
            tpu = (window_packed
                   if self.window_backend in ("packed", "packed_flat")
                   else window_kernel)
            return jax.lax.platform_dependent(qkv, cpu=window_chunked,
                                              default=tpu)

        if is_global is None:
            out = global_attn(qkv)
        else:
            out = jax.lax.cond(is_global, global_attn, window_attn, qkv)
        proj = Dense(c, dtype=self.dtype, name="proj")
        if residual is None:
            return proj(out)
        if self.dtype == jnp.bfloat16 and not self.quant_dense:
            # fused proj + residual (ops/mlp_pallas.dense_residual): same
            # conv-emitter pathology as the MLP at c=1280 — see Block
            from protosam_tpu.ops.mlp_pallas import dense_residual

            _ = proj(jnp.zeros((1, c), out.dtype))
            p = proj.variables["params"]

            def fused(o2, r2):
                return dense_residual(o2, p["kernel"].astype(self.dtype),
                                      p["bias"].astype(self.dtype), r2)

            def unfused(o2, r2):
                return r2 + proj(o2.reshape(b, h, w, c)).reshape(o2.shape)

            flat = lambda a: a.reshape(-1, c)
            return jax.lax.platform_dependent(
                flat(out), flat(residual), cpu=unfused,
                default=fused).reshape(b, h, w, c)
        return residual + proj(out)


class Block(nn.Module):
    """Transformer block; window vs global attention chosen at runtime by
    the scanned ``is_global`` flag (reference Block:125-193 chooses
    statically per layer — identical math, one traced copy).  The branch
    itself lives inside Attention so qkv/proj run once on the full grid."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    window_size: int = 14
    grid_size: int = 64
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    use_flash_relpos: bool = False
    window_backend: str = "packed_flat"
    window_wpp: int = 1
    window_wcp: int = 0
    global_backend: str = "packed"
    quant_dense: bool = False

    def setup(self):
        self.norm1 = TokenLayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.attn = Attention(self.num_heads, self.use_rel_pos, self.dtype,
                              table_rows=2 * self.grid_size - 1,
                              use_flash_relpos=self.use_flash_relpos,
                              window_backend=self.window_backend,
                              window_wpp=self.window_wpp,
                              window_wcp=self.window_wcp,
                              window_size=self.window_size,
                              global_backend=self.global_backend,
                              quant_dense=self.quant_dense)
        self.norm2 = TokenLayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.mlp = MLPBlock(int(self.embed_dim * self.mlp_ratio), _gelu,
                            self.dtype, quant_dense=self.quant_dense)

    def __call__(self, x: jax.Array, is_global: jax.Array):
        # PTPU_RESID_BARRIER=attn|mlp|both keeps the residual add OUT of
        # the proj/fc2 matmul fusion (XLA's kOutput conv fusions — the
        # "add_add" trace ops).  A/B knob for the vit_h fusion-efficiency
        # forensics (r3: those fusions run at ~50% MXU at c=1280 vs peak
        # at c=768).  MEASURED r4 on chip (vit_h encoder ms/batch-8,
        # scoped-vmem 49152): baseline 486.4, mlp 490.0, both 496.0 —
        # the barrier LOSES; the extra HBM round-trip of the delta costs
        # more than the fusion inefficiency it removes.  Default stays "".
        barrier = os.environ.get("PTPU_RESID_BARRIER", "")
        if (os.environ.get("PTPU_PROJ_PALLAS") == "1"
                and self.dtype == jnp.bfloat16):
            # fused proj+residual kernel (A/B; see Attention proj epilogue)
            x = self.attn(self.norm1(x), is_global, residual=x)
        else:
            attn_out = self.attn(self.norm1(x), is_global)
            if barrier in ("attn", "both"):
                attn_out = jax.lax.optimization_barrier(attn_out)
            x = x + attn_out
        mlp_in = self.norm2(x)
        if self._mlp_fuse_enabled():
            # fused Pallas MLP (ops/mlp_pallas): both dots + tanh GELU +
            # residual in one VMEM-resident kernel — the r4 answer to XLA's
            # conv emitter running the c=1280 fc1/fc2 at ~50-65% MXU
            # (EmitAllBatchInSublanes window configs; r4 HLO forensics).
            # bf16 TPU inference only; CPU / f32-strict keep the Dense
            # composition inside MLPBlock's platform_dependent.
            s = x.shape
            flat = lambda a: a.reshape(-1, s[-1])
            return self.mlp(flat(mlp_in), residual=flat(x),
                            fuse_tpu=True).reshape(s), None
        if os.environ.get("PTPU_MLP_2D") == "1":
            # A/B knob: flatten (B, H, W, C) -> (B*H*W, C) around the MLP so
            # XLA's dot path (not the 4-D conv emitter, whose
            # EmitAllBatchInSublanes window config runs the c=1280 fc2 at
            # ~50% MXU — see the r4 HLO forensics) lowers fc1/fc2.  The
            # reshape is a layout-preserving bitcast at {3,2,1,0}.
            s = mlp_in.shape
            mlp_out = self.mlp(mlp_in.reshape(-1, s[-1])).reshape(s)
        else:
            mlp_out = self.mlp(mlp_in)
        if barrier in ("mlp", "both"):
            mlp_out = jax.lax.optimization_barrier(mlp_out)
        x = x + mlp_out
        return x, None

    def _mlp_fuse_enabled(self) -> bool:
        """Fused Pallas MLP policy: PTPU_MLP_PALLAS=1/0 forces it on/off.

        Default stays OFF — MEASURED a loss on chip at the vit_h geometry
        (r4 marginal-cost A/B, ROUND_NOTES): kernel 5.0 ms/layer-batch8 vs
        XLA's own emitter at 4.6-4.8 regardless of lowering route (2-D,
        3-D, 4-D all equal).  The kernel stays for A/B reproducibility."""
        knob = os.environ.get("PTPU_MLP_PALLAS")
        if knob is not None:
            return knob == "1" and self.dtype == jnp.bfloat16
        return False


class ImageEncoderViT(nn.Module):
    """ViTDet encoder: 1024² -> 64×64×out_chans embedding.

    Configs per reference build_sam.py:55-107 (vit_b 768×12, vit_l 1024×24,
    vit_h 1280×32; window 14; 4 global blocks).
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32
    # rematerialize blocks under grad (the reference's
    # use_grad_checkpointing flag, image_encoder.py:36, 113-118)
    remat: bool = False
    use_flash_relpos: bool = False
    window_backend: str = "packed_flat"
    window_wpp: int = 1
    window_wcp: int = 0
    global_backend: str = "packed"
    # int8 MXU path for the block dense stages (qkv/proj/lin1/lin2);
    # patch embed, neck, and attention kernels stay in `dtype`
    quant_dense: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] preprocessed pixels -> [B, H/16, W/16, out_chans]."""
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        n = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n, n, self.embed_dim))
        x = x + pos.astype(self.dtype)

        is_global = jnp.asarray(
            [i in self.global_attn_indexes for i in range(self.depth)])

        block_cls = nn.remat(Block) if self.remat else Block
        ScannedBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            length=self.depth,
        )
        x, _ = ScannedBlocks(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            use_rel_pos=self.use_rel_pos,
            window_size=self.window_size,
            grid_size=n,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            use_flash_relpos=self.use_flash_relpos,
            window_backend=self.window_backend,
            window_wpp=self.window_wpp,
            window_wcp=self.window_wcp,
            global_backend=self.global_backend,
            quant_dense=self.quant_dense,
            name="blocks",
        )(x, is_global)

        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln2")(x)
        return x
