"""Training driver, TTT, LoRA, and ALPNet-only eval on synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.train.lora import (
    collapse_lora,
    init_lora,
    load_lora,
    merge_lora,
    save_lora,
)
from protosam_tpu.utils.config import Config

from tests.synthetic_data import HW, make_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_dataset(str(tmp_path_factory.mktemp("chaos_train")))


def _cfg(data_dir, tmp_path=""):
    cfg = Config()
    cfg.dataset = "CHAOST2_Superpix"
    cfg.data_dirs = {"CHAOST2_Superpix": data_dir, "CHAOST2": data_dir}
    cfg.input_size = (HW, HW)
    cfg.modelname = "dinov2_t14"
    cfg.dtype = "float32"
    cfg.num_workers = 2
    cfg.print_interval = 2
    cfg.save_snapshot_every = 4
    cfg.exclude_cls_list = []
    cfg.log_dir = tmp_path
    cfg.max_ccs = 4
    return cfg


def test_training_loop_runs_and_checkpoints(data_dir, tmp_path):
    from protosam_tpu.train.trainer import train

    cfg = _cfg(data_dir, str(tmp_path))
    cfg.grad_accumulation_steps = 2
    out = train(cfg, max_steps=4)
    assert len(out["history"]) >= 1
    assert np.isfinite(out["history"][-1]["loss"])
    # resume from snapshot
    out2 = train(cfg, max_steps=5)
    assert int(out2["state"].step) == 5


def test_alpnet_eval_runs(data_dir):
    from protosam_tpu.eval.alpnet_eval import run_alpnet_eval

    cfg = _cfg(data_dir)
    cfg.dataset = "CHAOST2"
    cfg.label_sets = 0   # test on {2, 3} (kidneys)
    cfg.support_idx = [-1]
    cfg.do_cca = True
    cfg.log_dir = ""
    res = run_alpnet_eval(cfg, write_preds=False)
    assert set(res["classDice"]) == {"2", "3"}
    assert 0.0 <= res["meanDice"] <= 1.0 or np.isnan(res["meanDice"])


def test_ttt_changes_params_and_stays_finite(rng):
    from protosam_tpu.eval.ttt import test_time_training

    model = FewShotSeg(image_size=56, which_model="dinov2_t14")
    img = rng.standard_normal((3, 56, 56)).astype(np.float32)
    pred = np.zeros((56, 56), np.float32)
    pred[20:40, 20:40] = 1
    supp = jnp.asarray(img)[None]
    fg = jnp.asarray(pred)[None]
    params = model.init(jax.random.PRNGKey(0), supp, fg, 1 - fg,
                        supp)["params"]
    new_params = test_time_training(model, params, img, pred, n_steps=2)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params,
                     new_params))
    assert np.isfinite(diff) and diff > 0


def test_lora_roundtrip(tmp_path, rng):
    model = FewShotSeg(image_size=56, which_model="dinov2_t14")
    img = jnp.asarray(rng.standard_normal((1, 3, 56, 56)), jnp.float32)
    fg = jnp.zeros((1, 56, 56)).at[:, 10:30, 10:30].set(1.0)
    params = model.init(jax.random.PRNGKey(0), img, fg, 1 - fg, img)["params"]

    lora = init_lora(params, rank=2, key=jax.random.PRNGKey(1))
    # scan-stacked blocks: one (layers, ...) factor per target kind
    assert len(lora["factors"]) == 4  # qkv, proj, fc1, fc2
    assert lora["factors"]["encoder/blocks/attn/qkv"]["a"].ndim == 3
    # b = 0 init -> merge is identity
    merged = merge_lora(params, lora)
    d = jax.tree.reduce(lambda a, b: max(a, b), jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, merged))
    assert d == 0.0

    # non-zero factors change only the targeted kernels
    lora["factors"] = jax.tree.map(lambda x: x + 0.01, lora["factors"])
    merged = merge_lora(params, lora)
    qkv = params["encoder"]["blocks"]["attn"]["qkv"]["kernel"]
    qkv2 = merged["encoder"]["blocks"]["attn"]["qkv"]["kernel"]
    assert float(jnp.abs(qkv2 - qkv).max()) > 0
    patch = params["encoder"]["patch_embed"]["kernel"]
    patch2 = merged["encoder"]["patch_embed"]["kernel"]
    assert float(jnp.abs(patch2 - patch).max()) == 0

    save_lora(str(tmp_path / "l.safetensors"), lora)
    back = load_lora(str(tmp_path / "l.safetensors"))
    assert back["rank"] == 2
    d = jax.tree.reduce(lambda a, b: max(a, b), jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), lora["factors"],
        back["factors"]))
    assert d == 0.0
    collapsed = collapse_lora(params, lora)
    d2 = float(jnp.abs(collapsed["encoder"]["blocks"]["attn"]["qkv"]["kernel"]
                       - qkv2).max())
    assert d2 == 0.0


def test_alpnet_eval_with_ttt(data_dir):
    """TTT-enabled eval path runs end-to-end (tiny model, 2 TTT steps)."""
    import protosam_tpu.eval.ttt as ttt_mod
    from protosam_tpu.eval.alpnet_eval import run_alpnet_eval

    orig = ttt_mod.test_time_training

    def fast_ttt(model, params, image, prediction, **kw):
        kw["n_steps"] = 1
        return orig(model, params, image, prediction, **kw)

    ttt_mod.test_time_training = fast_ttt
    try:
        cfg = _cfg(data_dir)
        cfg.dataset = "CHAOST2"
        cfg.label_sets = 0
        cfg.support_idx = [-1]
        cfg.ttt = True
        cfg.log_dir = ""
        res = run_alpnet_eval(cfg, write_preds=False)
        assert "meanDice" in res
    finally:
        ttt_mod.test_time_training = orig
