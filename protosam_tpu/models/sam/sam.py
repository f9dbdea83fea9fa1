"""SAM orchestration: preprocess, encode, decode, postprocess.

Behavioral spec: reference models/segment_anything/modeling/sam.py (Sam:18-173)
plus the pip-package SamPredictor flow the pipeline actually drives
(reference predictor.py:34-170 — ProtoSAM imports the *upstream* pip
predictor, models/ProtoSAM.py:8, whose postprocess_masks uses bilinear
interpolation; the local fork's nearest-mode variant, sam.py:154-158, is
selectable via ``postprocess_mode``).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from protosam_tpu.models.sam.image_encoder import ImageEncoderViT
from protosam_tpu.models.sam.mask_decoder import MaskDecoder
from protosam_tpu.models.sam.prompt_encoder import PromptEncoder
from protosam_tpu.ops.resize import resize_bilinear, resize_nearest

DEFAULT_PIXEL_MEAN = (123.675, 116.28, 103.53)
DEFAULT_PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0


class Sam(nn.Module):
    """Image encoder + prompt encoder + mask decoder with fixed 1024² frame."""

    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: tuple = (2, 5, 8, 11)
    prompt_embed_dim: int = 256
    image_size: int = 1024
    vit_patch_size: int = 16
    dtype: jnp.dtype = jnp.float32
    # Compute dtype for the prompt encoder + mask decoder.  None follows
    # ``dtype``.  Production bf16 builds set float32 here (registry
    # default): the decode tail is ~1% of pipeline FLOPs but its logits are
    # thresholded at 0, so bf16 rounding there flips mask-boundary pixels —
    # the dominant term of the measured bf16-vs-f32 drift (PARITY.md).
    decoder_dtype: jnp.dtype | None = None
    # Pallas flash attention with on-the-fly rel-pos for the global blocks
    # (ops/vitdet_flash.py, 2.9x over chunked XLA on v5e); lowering for CPU
    # falls back to the chunked path via jax.lax.platform_dependent.
    use_flash_relpos: bool = True
    window_backend: str = "packed_flat"  # "packed_flat" | "packed" | "flash" | "xla_aug"
    window_wpp: int = 1
    window_wcp: int = 0  # 0 = auto
    global_backend: str = "packed"  # "packed" | "flash"
    # int8 MXU path for the encoder's dense stages (ops/quant) — the v5e
    # runs int8 dots at ~2x the bf16 peak; opt-in, gated on measured mask
    # drift (PARITY.md).  The decode tail is never quantized.
    quant_dense: bool = False

    def setup(self):
        grid = self.image_size // self.vit_patch_size
        self.image_encoder = ImageEncoderViT(
            img_size=self.image_size,
            patch_size=self.vit_patch_size,
            embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth,
            num_heads=self.encoder_num_heads,
            out_chans=self.prompt_embed_dim,
            global_attn_indexes=self.encoder_global_attn_indexes,
            window_size=14,
            use_rel_pos=True,
            dtype=self.dtype,
            use_flash_relpos=self.use_flash_relpos,
            window_backend=self.window_backend,
            window_wpp=self.window_wpp,
            window_wcp=self.window_wcp,
            global_backend=self.global_backend,
            quant_dense=self.quant_dense,
        )
        dec_dt = (self.dtype if self.decoder_dtype is None
                  else self.decoder_dtype)
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.image_size, self.image_size),
            mask_in_chans=16,
            dtype=dec_dt,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=self.prompt_embed_dim, dtype=dec_dt)
        self._decode_dtype = dec_dt

    def encode_image(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) preprocessed -> (B, 64, 64, 256)."""
        return self.image_encoder(x)

    def decode(self, image_embedding: jax.Array, coords: jax.Array,
               labels: jax.Array, boxes: jax.Array | None = None,
               mask_inputs: jax.Array | None = None,
               multimask_output: bool = True,
               pad_points: bool = True):
        """One image embedding (1 or B, h, w, C) vs a batch of prompt sets.

        coords: (B, P, 2); labels: (B, P); boxes: (B, 4) or None.
        Returns (low_res_masks (B, M, 256, 256), iou_pred (B, M)).
        """
        image_embedding = image_embedding.astype(self._decode_dtype)
        sparse, dense = self.prompt_encoder(coords, labels, boxes, mask_inputs,
                                            pad_points=pad_points)
        b = sparse.shape[0]
        if image_embedding.shape[0] == 1 and b > 1:
            image_embedding = jnp.broadcast_to(
                image_embedding, (b, *image_embedding.shape[1:]))
        image_pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(image_embedding, image_pe, sparse, dense,
                                 multimask_output)

    def __call__(self, x, coords, labels, boxes=None, mask_inputs=None):
        emb = self.encode_image(x)
        if mask_inputs is None and self.is_initializing():
            # route a dummy mask through the downscaling convs so ALL params
            # exist after init (mask prompts are an optional runtime branch)
            h = 4 * (self.image_size // self.vit_patch_size)
            mask_inputs = jnp.zeros((coords.shape[0], h, h, 1))
        return self.decode(emb, coords, labels, boxes, mask_inputs)


def preprocess(x: jax.Array, img_size: int = 1024,
               pixel_mean=DEFAULT_PIXEL_MEAN,
               pixel_std=DEFAULT_PIXEL_STD) -> jax.Array:
    """Normalize and zero-pad bottom/right to the square encoder frame.

    x: (B, H, W, 3) resized longest-side pixels.  Reference sam.py:163-173.
    """
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (x - mean) / std
    b, h, w, c = x.shape
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(masks: jax.Array, input_size: tuple[int, int],
                      original_size: tuple[int, int], img_size: int = 1024,
                      mode: str = "bilinear") -> jax.Array:
    """Upscale low-res (B, M, 256, 256) logits to the original frame.

    mode='bilinear' matches the upstream pip SAM the pipeline drives;
    mode='nearest' matches the local fork delta (reference sam.py:154-158).
    """
    rs = resize_bilinear if mode == "bilinear" else resize_nearest
    masks = rs(masks, (img_size, img_size))
    masks = masks[..., :input_size[0], :input_size[1]]
    return rs(masks, original_size)
