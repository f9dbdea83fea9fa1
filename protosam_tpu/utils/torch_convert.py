"""One-time PyTorch checkpoint -> flax param-tree converters.

Supports the three checkpoint families the reference loads
(SURVEY.md §5 checkpoint/resume):
  * SAM / MedSAM ``.pth`` state dicts (keys per
    reference models/segment_anything/build_sam.py:55-107),
  * DINOv2 torch.hub state dicts,
  * ALPNet snapshots (encoder + parameter-free cls head).

Input is a flat ``{name: np.ndarray}`` dict (call ``.numpy()`` on torch
tensors first, or pass a torch state_dict — tensors are converted).
Output is a nested flax ``params`` dict matching protosam_tpu's modules.

Layout rules (torch -> flax):
  Linear  (out, in)            -> kernel (in, out)
  Conv2d  (out, in, kh, kw)    -> kernel (kh, kw, in, out)
  ConvT2d (in, out, kh, kw)    -> kernel (kh, kw, in, out)
  LayerNorm weight             -> scale (flax nn.LayerNorm)
  custom LayerNorm2d weight    -> weight (kept)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: dict, path: list[str], value: np.ndarray):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def _linear(tree, path, key, w):
    _set(tree, path + (["kernel"] if key == "weight" else ["bias"]),
         w.T if key == "weight" else w)


def _conv(tree, path, key, w):
    _set(tree, path + (["kernel"] if key == "weight" else ["bias"]),
         w.transpose(2, 3, 1, 0) if key == "weight" else w)


def _convT(tree, path, key, w):
    # flax ConvTranspose correlates (no kernel flip) while torch's
    # ConvTranspose2d flips — flip the spatial dims during conversion.
    _set(tree, path + (["kernel"] if key == "weight" else ["bias"]),
         np.ascontiguousarray(w[:, :, ::-1, ::-1]).transpose(2, 3, 0, 1)
         if key == "weight" else w)


def _ln(tree, path, key, w):
    _set(tree, path + (["scale"] if key == "weight" else ["bias"]), w)


def _ln2d(tree, path, key, w):
    _set(tree, path + ([key]), w)


def _attn(tree, path, rest, w):
    # transformer.Attention: q_proj/k_proj/v_proj/out_proj linears
    proj, key = rest
    _linear(tree, path + [proj], key, w)


def convert_sam(state_dict: Mapping[str, Any]) -> dict:
    """Convert a SAM/MedSAM torch state dict to protosam_tpu flax params."""
    params: dict = {}
    for name, v in state_dict.items():
        w = _np(v)
        parts = name.split(".")
        root = parts[0]

        if root == "image_encoder":
            p = ["image_encoder"]
            if parts[1] == "patch_embed":
                _conv(params, p + ["patch_embed"], parts[-1], w)
            elif parts[1] == "pos_embed":
                _set(params, p + ["pos_embed"], w)
            elif parts[1] == "blocks":
                # collected per layer, stacked at the end (scan layout)
                i, sub = parts[2], parts[3]
                bp = p + ["__layers__", i]
                if sub in ("norm1", "norm2"):
                    _ln(params, bp + [sub], parts[-1], w)
                elif sub == "attn":
                    leaf = parts[4]
                    if leaf in ("rel_pos_h", "rel_pos_w"):
                        _set(params, bp + ["attn", leaf], w)
                    else:
                        _linear(params, bp + ["attn", leaf], parts[-1], w)
                elif sub == "mlp":
                    _linear(params, bp + ["mlp", parts[4]], parts[-1], w)
            elif parts[1] == "neck":
                idx = parts[2]
                tgt = {"0": ("neck_conv1", _conv), "1": ("neck_ln1", _ln2d),
                       "2": ("neck_conv2", _conv), "3": ("neck_ln2", _ln2d)}[idx]
                tgt[1](params, p + [tgt[0]], parts[-1], w)

        elif root == "prompt_encoder":
            p = ["prompt_encoder"]
            if parts[1] == "pe_layer":
                _set(params, p + ["pe_layer",
                                  "positional_encoding_gaussian_matrix"], w)
            elif parts[1] == "point_embeddings":
                _set(params, p + [f"point_embeddings_{parts[2]}"], w)
            elif parts[1] in ("not_a_point_embed", "no_mask_embed"):
                _set(params, p + [parts[1]], w)
            elif parts[1] == "mask_downscaling":
                idx = parts[2]
                tgt = {"0": ("mask_down_conv1", _conv),
                       "1": ("mask_down_ln1", _ln2d),
                       "3": ("mask_down_conv2", _conv),
                       "4": ("mask_down_ln2", _ln2d),
                       "6": ("mask_down_conv3", _conv)}[idx]
                tgt[1](params, p + [tgt[0]], parts[-1], w)

        elif root == "mask_decoder":
            p = ["mask_decoder"]
            if parts[1] in ("iou_token", "mask_tokens"):
                _set(params, p + [parts[1]], w)
            elif parts[1] == "transformer":
                if parts[2] == "layers":
                    i, sub = parts[3], parts[4]
                    tp = p + ["transformer", f"layers_{i}"]
                    if sub.startswith("norm"):
                        _ln(params, tp + [sub], parts[-1], w)
                    elif sub == "mlp":
                        _linear(params, tp + ["mlp", parts[5]], parts[-1], w)
                    else:  # self_attn / cross_attn_*
                        _attn(params, tp + [sub], parts[5:], w)
                elif parts[2] == "final_attn_token_to_image":
                    _attn(params, p + ["transformer", parts[2]], parts[3:], w)
                elif parts[2] == "norm_final_attn":
                    _ln(params, p + ["transformer", parts[2]], parts[-1], w)
            elif parts[1] == "output_upscaling":
                idx = parts[2]
                tgt = {"0": ("upscale_conv1", _convT),
                       "1": ("upscale_ln", _ln2d),
                       "3": ("upscale_conv2", _convT)}[idx]
                tgt[1](params, p + [tgt[0]], parts[-1], w)
            elif parts[1] == "output_hypernetworks_mlps":
                i, j = parts[2], parts[4]
                _linear(params,
                        p + [f"output_hypernetworks_mlps_{i}", f"layers_{j}"],
                        parts[-1], w)
            elif parts[1] == "iou_prediction_head":
                _linear(params,
                        p + ["iou_prediction_head", f"layers_{parts[3]}"],
                        parts[-1], w)
        # pixel_mean / pixel_std buffers are constants, handled in preprocess

    if "image_encoder" in params and "__layers__" in params["image_encoder"]:
        params["image_encoder"]["blocks"] = _stack_layers(
            params["image_encoder"].pop("__layers__"),
            pad_rel_pos_to_max=True)
    return params


def _stack_layers(layers: dict, pad_rel_pos_to_max: bool = False) -> dict:
    """{'0': tree, '1': tree, ...} -> one tree with a stacked leading axis
    (flax nn.scan layout).  Rel-pos tables of differing row counts (windowed
    27 vs global 127) are zero-padded to the max."""
    order = sorted(layers, key=int)
    trees = [layers[i] for i in order]

    if pad_rel_pos_to_max:
        max_rows = 0
        for t in trees:
            attn = t.get("attn", {})
            for k in ("rel_pos_h", "rel_pos_w"):
                if k in attn:
                    max_rows = max(max_rows, attn[k].shape[0])
        for t in trees:
            attn = t.get("attn", {})
            for k in ("rel_pos_h", "rel_pos_w"):
                if k in attn and attn[k].shape[0] < max_rows:
                    pad = max_rows - attn[k].shape[0]
                    attn[k] = np.concatenate(
                        [attn[k], np.zeros((pad, attn[k].shape[1]),
                                           attn[k].dtype)], axis=0)

    def stack(*leaves):
        return np.stack(leaves, axis=0)

    import jax

    return jax.tree.map(stack, *trees)


def convert_dinov2(state_dict: Mapping[str, Any]) -> dict:
    """Convert a DINOv2 torch.hub state dict to protosam_tpu flax params.

    Hub key layout: cls_token, pos_embed, register_tokens?, mask_token
    (unused at inference — skipped), patch_embed.proj.*, blocks.{i}.{norm1,
    attn.qkv, attn.proj, ls1.gamma, norm2, mlp.fc1, mlp.fc2, ls2.gamma},
    norm.*.
    """
    params: dict = {}
    for name, v in state_dict.items():
        w = _np(v)
        parts = name.split(".")
        if name in ("cls_token", "pos_embed", "register_tokens"):
            _set(params, [name], w)
        elif name == "mask_token":
            continue
        elif parts[0] == "patch_embed":
            _conv(params, ["patch_embed"], parts[-1], w)
        elif parts[0] == "blocks":
            i, sub = parts[1], parts[2]
            bp = ["__layers__", i]
            if sub in ("norm1", "norm2"):
                _ln(params, bp + [sub], parts[-1], w)
            elif sub == "attn":
                _linear(params, bp + ["attn", parts[3]], parts[-1], w)
            elif sub in ("ls1", "ls2"):
                _set(params, bp + [sub, "gamma"], w)
            elif sub == "mlp":
                _linear(params, bp + [f"mlp_{parts[3]}"], parts[-1], w)
        elif parts[0] == "norm":
            _ln(params, ["norm"], parts[-1], w)
    if "__layers__" in params:
        params["blocks"] = _stack_layers(params.pop("__layers__"))
    return params


def convert_deeplab_resnet101(state_dict: Mapping[str, Any]) -> dict:
    """Convert the reference's TVDeeplabRes101Encoder weights (torchvision
    deeplabv3_resnet101 backbone + 1×1 localconv; reference
    models/backbone/torchvision_backbones.py:12-58) to flax params.

    Accepted key layouts: ``backbone.<...>`` (the wrapper's own state dict)
    or bare torchvision ``conv1/bn1/layer{1-4}...`` keys.
    """
    params: dict = {}

    def bn(path, key, w):
        name = {"weight": "weight", "bias": "bias",
                "running_mean": "running_mean",
                "running_var": "running_var"}.get(key)
        if name is not None:
            _set(params, path + [name], w)

    for name, v in state_dict.items():
        w = _np(v)
        parts = name.split(".")
        if parts[0] == "backbone":
            parts = parts[1:]
        if not parts:
            continue
        if parts[0] == "conv1":
            _conv(params, ["conv1"], parts[-1], w)
        elif parts[0] == "bn1":
            bn(["bn1"], parts[-1], w)
        elif parts[0].startswith("layer"):
            li = parts[0][len("layer"):]
            bi = parts[1]
            base = [f"layer{li}_{bi}"]
            sub = parts[2]
            if sub.startswith("conv"):
                _conv(params, base + [sub], parts[-1], w)
            elif sub.startswith("bn"):
                bn(base + [sub], parts[-1], w)
            elif sub == "downsample":
                if parts[3] == "0":
                    _conv(params, base + ["downsample_conv"], parts[-1], w)
                else:
                    bn(base + ["downsample_bn"], parts[-1], w)
        elif parts[0] == "localconv":
            _conv(params, ["localconv"], parts[-1], w)
        # classifier/aspp heads are dropped (reference drops ASPP too)
    return params


def load_sam_pth(path: str) -> dict:
    """Load a SAM/MedSAM ``.pth`` and convert (requires torch, CPU-only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_sam(sd)


def hf_dinov2_to_hub_state_dict(sd: Mapping[str, Any]) -> dict:
    """Map a HuggingFace ``Dinov2Model`` state dict to the facebook-hub
    layout ``convert_dinov2`` expects (per-layer q/k/v fused back into qkv).

    The reference consumes the torch.hub DINOv2 checkpoints
    (grid_proto_fewshot.py:54-72); HF mirrors the same weights under
    different names, so this lets users load the widely-mirrored HF
    checkpoints (facebook/dinov2-large etc.) without torch.hub egress.
    """
    import numpy as np

    cat = (lambda xs: np.concatenate([_np(x) for x in xs], axis=0))
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    if "embeddings.mask_token" in sd:
        out["mask_token"] = sd["embeddings.mask_token"]
    if "embeddings.register_tokens" in sd:
        out["register_tokens"] = sd["embeddings.register_tokens"]
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        p = f"encoder.layer.{i}."
        out[f"blocks.{i}.attn.qkv.weight"] = cat(
            [sd[p + "attention.attention." + n + ".weight"]
             for n in ("query", "key", "value")])
        out[f"blocks.{i}.attn.qkv.bias"] = cat(
            [sd[p + "attention.attention." + n + ".bias"]
             for n in ("query", "key", "value")])
        out[f"blocks.{i}.attn.proj.weight"] = \
            sd[p + "attention.output.dense.weight"]
        out[f"blocks.{i}.attn.proj.bias"] = \
            sd[p + "attention.output.dense.bias"]
        for a, b in (("norm1", "norm1"), ("norm2", "norm2")):
            out[f"blocks.{i}.{a}.weight"] = sd[p + b + ".weight"]
            out[f"blocks.{i}.{a}.bias"] = sd[p + b + ".bias"]
        out[f"blocks.{i}.ls1.gamma"] = sd[p + "layer_scale1.lambda1"]
        out[f"blocks.{i}.ls2.gamma"] = sd[p + "layer_scale2.lambda1"]
        for fc in ("fc1", "fc2"):
            out[f"blocks.{i}.mlp.{fc}.weight"] = sd[p + f"mlp.{fc}.weight"]
            out[f"blocks.{i}.mlp.{fc}.bias"] = sd[p + f"mlp.{fc}.bias"]
        i += 1
    return out
