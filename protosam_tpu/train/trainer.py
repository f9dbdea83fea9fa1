"""Episodic self-supervised training driver (reference training.py:106-243).

Superpixel episodes -> batched jitted train step (weighted CE + align loss,
SGD + MultiStep decay), gradient accumulation, rolling orbax snapshots,
JSONL metric logging.  Episodes are assembled by a thread-pool prefetcher
(the reference's DataLoader workers) and batched for the TPU.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from protosam_tpu.data.superpixel import SuperpixelDataset
from protosam_tpu.data.transforms import get_aug, transform_with_label
from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.train.step import TrainState, make_optimizer, make_train_step
from protosam_tpu.utils.checkpoint import CheckpointManager
from protosam_tpu.utils.config import Config

log = logging.getLogger("trainer")


class EpisodePrefetcher:
    """Threaded episode producer (replaces torch DataLoader workers)."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 seed: int = 0, depth: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.stop = threading.Event()
        self.rngs = [np.random.RandomState(seed + i)
                     for i in range(max(num_workers, 1))]
        self.threads = [threading.Thread(target=self._work, args=(i,),
                                         daemon=True)
                        for i in range(max(num_workers, 1))]
        for t in self.threads:
            t.start()

    def _episode(self, rng):
        idx = int(rng.randint(0, len(self.dataset)))
        ep = self.dataset[idx]
        supp = np.stack([np.asarray(s) for s in ep["support_images"][0]])
        fg = np.stack([np.asarray(m["fg_mask"])
                       for m in ep["support_mask"][0]])
        bg = np.stack([np.asarray(m["bg_mask"])
                       for m in ep["support_mask"][0]])
        qry = np.stack([np.asarray(q) for q in ep["query_images"]])
        lbl = np.asarray(ep["query_labels"][0]).astype(np.int32)
        return supp, fg, bg, qry, lbl

    def _work(self, i):
        rng = self.rngs[i]
        while not self.stop.is_set():
            eps = [self._episode(rng) for _ in range(self.batch_size)]
            batch = tuple(np.stack([e[j] for e in eps])
                          for j in range(5))
            try:
                self.q.put(batch, timeout=1.0)
            except queue.Full:
                continue

    def __next__(self):
        return self.q.get()

    def close(self):
        self.stop.set()


def train(cfg: Config, max_steps: int | None = None) -> dict:
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = FewShotSeg(image_size=cfg.input_size[0],
                       which_model=cfg.modelname,
                       proto_grid_size=cfg.proto_grid_size, dtype=dtype)

    aug = get_aug(cfg.which_aug, cfg.input_size[0])
    transforms = transform_with_label(aug)
    baseset = cfg.dataset.split("_")[0]
    dataset = SuperpixelDataset(
        which_dataset=baseset, base_dir=cfg.data_dir(), idx_split=cfg.eval_fold,
        mode="train", image_size=cfg.input_size[0], transforms=transforms,
        exclude_list=cfg.exclude_cls_list, superpix_scale=cfg.superpix_scale,
        use_clahe=cfg.use_clahe, use_3_slices=cfg.use_3_slices, seed=cfg.seed)

    rng = jax.random.PRNGKey(cfg.seed)
    hw = cfg.input_size[0]
    dummy = jnp.zeros((1, 3, hw, hw))
    m = jnp.zeros((1, hw, hw)).at[:, hw // 3: hw // 2, hw // 3: hw // 2].set(1.)
    params = model.init(rng, dummy, m, 1 - m, dummy)["params"]

    opt = make_optimizer(lr=cfg.lr, momentum=cfg.momentum,
                         weight_decay=cfg.weight_decay,
                         lr_gamma=cfg.lr_step_gamma,
                         optim_type=cfg.optim_type)
    import optax

    if cfg.grad_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, cfg.grad_accumulation_steps)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(
        model, opt, align_weight=1.0 if cfg.usealign else 0.0))

    ckpt = CheckpointManager(os.path.join(cfg.log_dir, "snapshots")) \
        if cfg.log_dir else None
    restored = None
    if ckpt is not None:
        restored, at_step = ckpt.restore(state)
        if restored is not None:
            state = restored
            log.info("resumed from step %d", at_step)

    loader = EpisodePrefetcher(dataset, batch_size=max(cfg.batch_size, 1),
                               num_workers=cfg.num_workers, seed=cfg.seed)
    n_steps = max_steps if max_steps is not None else cfg.n_steps
    metrics_path = os.path.join(cfg.log_dir or ".", "train_metrics.jsonl")
    if cfg.log_dir:
        os.makedirs(cfg.log_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.log_dir, "config.json"))
        cfg.snapshot_sources(cfg.log_dir)

    tb = None
    if cfg.log_dir:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(os.path.join(cfg.log_dir, "tboard"))
        except ImportError:
            tb = None

    history = []
    skipped = 0
    t0 = time.time()
    try:
        for it in range(int(state.step), n_steps):
            batch = jax.tree.map(jnp.asarray, next(loader))
            new_state, metrics = step_fn(state, batch)
            # faulty-batch tolerance (reference training.py:190-199 wraps the
            # step in try/except and skips): a non-finite loss skips the
            # update instead of poisoning the params
            if not bool(jnp.isfinite(metrics["loss"])):
                skipped += 1
                log.warning("skipping faulty batch at step %d "
                            "(non-finite loss, %d skipped total)",
                            it, skipped)
                continue
            state, metrics = new_state, metrics
            if (it + 1) % cfg.print_interval == 0 or it == n_steps - 1:
                m_host = {k: float(v) for k, v in metrics.items()}
                m_host.update(step=it + 1,
                              sps=(it + 1) / (time.time() - t0))
                history.append(m_host)
                log.info("step %d: %s", it + 1, m_host)
                if cfg.log_dir:
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(m_host) + "\n")
                if tb is not None:
                    for k in ("loss", "ce", "align_loss"):
                        tb.add_scalar(f"train/{k}", m_host[k], it + 1)
            if ckpt is not None and (it + 1) % cfg.save_snapshot_every == 0:
                ckpt.save(it + 1, jax.device_get(state))
    finally:
        loader.close()
    if ckpt is not None:
        ckpt.save(n_steps, jax.device_get(state))
        ckpt.wait()
    return {"state": state, "history": history, "model": model}
