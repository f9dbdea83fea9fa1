"""Episodic self-supervised training step for the ALPNet coarse model.

Behavioral spec: reference training.py:147-208 — weighted cross-entropy
(class weights [0.05, 1.0], ignore label 255, util/utils.py:614-625) plus the
PANet prototype-alignment loss (grid_proto_fewshot.py:275-279), SGD with
momentum + MultiStep LR decay (gamma 0.95 every 1000 iters), gradient
accumulation.

TPU-first: the step is a pure jittable function over an episode batch and is
pjit-shardable — episodes over the 'data' mesh axis, optional tensor
sharding of the encoder over 'model' (see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

CE_WEIGHTS = (0.05, 1.0)  # reference config_ssl_upload / training.py:158-160
IGNORE_LABEL = 255


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def weighted_ce(logits: jax.Array, labels: jax.Array,
                weights=CE_WEIGHTS) -> jax.Array:
    """torch CrossEntropyLoss(weight=[0.05, 1.0], ignore_index=255) on
    (B, 2, H, W) logits vs (B, H, W) integer labels.

    torch's weighted mean divides by the *sum of the weights* of the
    non-ignored targets, not the count — replicated exactly.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    valid = labels != IGNORE_LABEL
    safe = jnp.clip(labels, 0, logits.shape[1] - 1)
    picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    w = jnp.asarray(weights)[safe] * valid
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1e-8)


def make_optimizer(lr: float = 1e-3, momentum: float = 0.9,
                   weight_decay: float = 5e-4, lr_gamma: float = 0.95,
                   lr_step_every: int = 1000, optim_type: str = "sgd"):
    """SGD+momentum with MultiStepLR(milestones=every 1000, gamma=0.95)
    (reference training.py:147-156) or AdamW."""
    sched = lambda step: lr * lr_gamma ** (step // lr_step_every)
    if optim_type == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=sched, momentum=momentum),
        )
    return optax.adamw(learning_rate=sched, weight_decay=weight_decay)


def make_train_step(model, optimizer, align_weight: float = 1.0,
                    val_wsize: int = 2):
    """Build the jittable episodic train step.

    Episode arrays (leading axis = episode batch, shardable over 'data'):
      supp   (B, S, 3, H, W)    support images
      fg/bg  (B, S, H, W)       support fore/background masks
      qry    (B, 1, 3, H, W)    query image
      lbl    (B, H, W) int32    query labels (255 = ignore)
    """

    def episode_loss(params, supp, fg, bg, qry, lbl):
        out = model.apply({"params": params}, supp, fg, bg, qry,
                          False, val_wsize)
        logits = out["logits"]
        ce = weighted_ce(logits, lbl[None])
        pred_feat = model.apply(
            {"params": params}, out["qry_fts"], logits, out["supp_fts"],
            fg, bg, model.kernel_size, method=model.align_loss)
        return ce + align_weight * pred_feat, (ce, pred_feat)

    def batch_loss(params, batch):
        losses, aux = jax.vmap(
            lambda s, f, b, q, l: episode_loss(params, s, f, b, q, l)
        )(*batch)
        return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

    def train_step(state: TrainState, batch):
        (loss, (ce, align)), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {"loss": loss, "ce": ce, "align_loss": align}
        return new_state, metrics

    return train_step
