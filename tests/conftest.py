"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is a single chip in this environment; all sharding tests run
against a forced 8-device CPU platform so multi-chip code paths execute.
"""

import os

# Must be set before jax is imported anywhere.  The environment pre-sets
# JAX_PLATFORMS=axon (the real TPU tunnel); tests force CPU so they are fast
# and can fake an 8-device mesh.  The axon sitecustomize registers its backend
# via jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var — so we must override back at the config level, not the env level.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _patch_torch_cuda():
    """The reference alpmodule hardcodes ``.cuda()`` (alpmodule.py:16); make it
    a no-op so parity tests can run the reference on CPU."""
    try:
        import torch
    except ImportError:
        return
    torch.Tensor.cuda = lambda self, *a, **k: self


_patch_torch_cuda()
