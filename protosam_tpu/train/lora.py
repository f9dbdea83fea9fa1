"""LoRA for the frozen encoders — functional param-tree formulation.

Behavioral spec: reference util/lora.py — ``inject_trainable_lora`` replaces
``nn.Linear`` modules under the DINOv2 block classes (attention + MLP,
util/lora.py:168-170, 258-312) with ``W + (scale) * B @ A`` adapters of rank
r; save/load via safetensors; ``collapse`` folds the adapters into the base
weights (util/lora.py:638-673).

TPU-native design: instead of module surgery, LoRA lives as a separate
pytree of (a, b) factors keyed by the same paths as the base kernels.
``merge_lora(params, lora)`` materializes ``W + scale * a @ b`` — a pure
function XLA fuses into the forward — so training differentiates w.r.t. the
factors only while the base stays frozen.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# kernels that receive adapters: DINOv2 attention + MLP linears
# (reference DINO_TARGET_REPLACE = {NestedTensorBlock, Mlp, Attention,
#  MemEffAttention}, util/lora.py:168-170 — i.e. every Linear in a block)
DEFAULT_TARGETS = ("qkv", "proj", "mlp_fc1", "mlp_fc2")


def _iter_kernels(params: Any, targets):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [p.key for p in path if hasattr(p, "key")]
        # 2-D: plain Dense kernel; 3-D: nn.scan-stacked (layers, in, out)
        if len(names) >= 2 and names[-1] == "kernel" and \
                names[-2] in targets and leaf.ndim in (2, 3):
            yield tuple(names), leaf


def init_lora(params: Any, rank: int = 4, key=None,
              targets=DEFAULT_TARGETS, scale: float = 1.0) -> dict:
    """Build the LoRA factor tree: {path: {'a': (in, r), 'b': (r, out)}}.

    a ~ N(0, 1/r) and b = 0, the reference's init (lora_down normal /
    lora_up zeros, util/lora.py:55-60), so the initial merge is an identity.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    tree: dict = {"scale": scale, "rank": rank, "factors": {}}
    for names, leaf in _iter_kernels(params, targets):
        key, sub = jax.random.split(key)
        if leaf.ndim == 2:
            d_in, d_out = leaf.shape
            a_shape, b_shape = (d_in, rank), (rank, d_out)
        else:  # stacked (layers, in, out): per-layer factors
            n_layers, d_in, d_out = leaf.shape
            a_shape, b_shape = (n_layers, d_in, rank), (n_layers, rank, d_out)
        tree["factors"]["/".join(names[:-1])] = {
            "a": jax.random.normal(sub, a_shape, jnp.float32) / rank,
            "b": jnp.zeros(b_shape, jnp.float32),
        }
    return tree


def merge_lora(params: Any, lora: dict) -> Any:
    """W' = W + scale * a @ b for every adapted kernel (pure, jittable)."""
    factors = lora["factors"]
    scale = lora["scale"]

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, prefix + [k])
            elif k == "kernel" and "/".join(prefix) in factors:
                f = factors["/".join(prefix)]
                # @ batches over the leading layer axis for stacked kernels
                delta = (f["a"] @ f["b"]).astype(v.dtype)
                out[k] = v + scale * delta
            else:
                out[k] = v
        return out

    return walk(params, [])


def collapse_lora(params: Any, lora: dict) -> Any:
    """Fold adapters into the base weights permanently
    (reference collapse_lora, util/lora.py:638-673)."""
    return merge_lora(params, lora)


def save_lora(path: str, lora: dict):
    from safetensors.numpy import save_file

    flat = {}
    for name, f in lora["factors"].items():
        flat[f"{name}:a"] = np.asarray(f["a"])
        flat[f"{name}:b"] = np.asarray(f["b"])
    save_file(flat, path, metadata={"scale": str(lora["scale"]),
                                    "rank": str(lora["rank"])})


def load_lora(path: str) -> dict:
    from safetensors.numpy import safe_open

    factors: dict = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        for key in f.keys():
            name, part = key.rsplit(":", 1)
            factors.setdefault(name, {})[part] = jnp.asarray(f.get_tensor(key))
    return {"scale": float(meta.get("scale", 1.0)),
            "rank": int(meta.get("rank", 4)), "factors": factors}


def lora_train_step_fn(model, optimizer, loss_fn):
    """Wrap a loss over merged params into a step that trains only LoRA."""

    def step(lora_factors, opt_state, base_params, batch, lora_meta):
        def loss_of(factors):
            lora = {"scale": lora_meta["scale"], "rank": lora_meta["rank"],
                    "factors": factors}
            return loss_fn(merge_lora(base_params, lora), batch)

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            lora_factors)
        updates, opt_state = optimizer.update(grads, opt_state, lora_factors)
        import optax

        lora_factors = optax.apply_updates(lora_factors, updates)
        return lora_factors, opt_state, loss, aux

    return jax.jit(step)
