"""Test-time training (reference validation.py:39-97).

Fine-tune the coarse model on a single query slice using its own coarse
prediction as a pseudo-label: each step draws two independent augmentations
of (image, prediction) as a synthetic (support, query) episode and trains
with weighted CE + align loss.  The caller restores the pre-TTT params
afterwards when ``reset_after_slice`` is set (reference validation.py:279-281).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from protosam_tpu.data.transforms import get_aug, transform_with_label
from protosam_tpu.train.step import TrainState, make_optimizer, make_train_step

# the jitted TTT step is shape/model-keyed and reused across slices —
# rebuilding it per slice would recompile every time
_STEP_CACHE: dict = {}


def _get_step(model, lr, optim_type, align_weight):
    key = (repr(model), lr, optim_type, align_weight)
    if key not in _STEP_CACHE:
        opt = make_optimizer(lr=lr, optim_type=optim_type)
        _STEP_CACHE[key] = (opt, jax.jit(
            make_train_step(model, opt, align_weight=align_weight)))
    return _STEP_CACHE[key]


def test_time_training(model, params, image: np.ndarray,
                       prediction: np.ndarray, *, n_steps: int = 20,
                       which_aug: str = "sabs_aug", lr: float = 1e-3,
                       optim_type: str = "sgd", align_weight: float = 1.0,
                       seed: int = 0):
    """image (C, H, W) numpy; prediction (H, W) binary.  Returns new params."""
    aug = get_aug(which_aug, image.shape[-1])
    rng = np.random.RandomState(seed)
    tr = transform_with_label(aug, rng=rng)

    comp = np.concatenate(
        [image.transpose(1, 2, 0), prediction[..., None]], axis=-1)

    opt, step_fn = _get_step(model, lr, optim_type, align_weight)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    c_img = image.shape[0]
    for _ in range(n_steps):
        q_img, q_lbl = tr(comp, c_img=c_img, c_label=1, nclass=2,
                          use_onehot=False)
        s_img, s_lbl = tr(comp, c_img=c_img, c_label=1, nclass=2,
                          use_onehot=False)
        batch = (
            jnp.asarray(s_img.transpose(2, 0, 1))[None, None],   # (1,S=1,C,H,W)
            jnp.asarray(s_lbl[..., 0], jnp.float32)[None, None],
            jnp.asarray(1.0 - s_lbl[..., 0], jnp.float32)[None, None],
            jnp.asarray(q_img.transpose(2, 0, 1))[None, None],
            jnp.asarray(q_lbl[..., 0], jnp.int32)[None],
        )
        state, _ = step_fn(state, batch)
    return state.params
