"""orbax save/load round-trips for param trees."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.utils.checkpoint import load_params, save_params


def test_save_load_roundtrip(tmp_path):
    params = {"a": {"kernel": jnp.arange(12.0).reshape(3, 4),
                    "bias": jnp.ones(4)},
              "b": jnp.asarray([1, 2, 3], jnp.int32)}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    back = load_params(path, params)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), params, back)
