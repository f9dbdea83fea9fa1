"""Numerical-health and debug tooling.

The reference's only runtime guards are
``torch.autograd.set_detect_anomaly(True)`` (training.py:109) and scattered
asserts; the JAX-native counterparts here are first-class:

* ``enable_nan_checks`` — jax debug_nans/debug_infs (fail fast inside jit);
* ``checked`` — checkify wrapper that threads error state through a jitted
  function and raises on the host;
* ``assert_finite_tree`` — pytree-wide finite check for params/grads;
* ``set_deterministic`` — deterministic XLA reductions for reproducible
  runs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked(fn):
    """Wrap a jittable fn so checkify.check failures raise on the host."""
    from jax.experimental import checkify

    cfn = checkify.checkify(fn,
                            errors=checkify.float_checks | checkify.user_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite_tree(tree: Any, name: str = "tree"):
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {bad[:10]}"
            + (f" (+{len(bad) - 10} more)" if len(bad) > 10 else ""))


def set_deterministic(enable: bool = True):
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    tok = "--xla_gpu_deterministic_ops=true"
    if enable and tok not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + tok).strip()
    jax.config.update("jax_default_prng_impl", "threefry2x32")
