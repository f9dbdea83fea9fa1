import numpy as np
import pytest

import jax.numpy as jnp

from protosam_tpu.utils.debugging import assert_finite_tree, checked


def test_assert_finite_tree():
    ok = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite_tree(ok)
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError):
        assert_finite_tree(bad, "params")


def test_checked_wrapper():
    from jax.experimental import checkify

    def f(x):
        checkify.check(jnp.all(x > 0), "x must be positive")
        return jnp.log(x)

    g = checked(f)
    np.testing.assert_allclose(np.asarray(g(jnp.asarray([1.0, 2.0]))),
                               np.log([1.0, 2.0]), atol=1e-6)
    with pytest.raises(Exception):
        g(jnp.asarray([-1.0]))
