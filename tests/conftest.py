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

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# fast / slow lanes.  Tests whose recorded CPU duration exceeds the threshold
# are auto-marked ``slow`` from the committed timing snapshot — the fast lane
# (`pytest -m "not slow"`, <5 min) is the working-cadence signal, the full
# suite (~23 min) the nightly lane.  Durations come from a full-suite
# ``--durations=0`` run; refresh with
#   python -m pytest tests/ -q --durations=0 | <update tests/durations.json>
# New tests without a recorded duration default to the fast lane.
# ---------------------------------------------------------------------------
_SLOW_THRESH_S = 5.5
# parity classes that must stay in the fast lane even though they are slow:
# the recorded end-to-end reference-agreement golden (coarse+CCA+SAM).
_ALWAYS_FAST = {
    "tests/test_agreement_recorded.py::test_recorded_agreement[cca-True]",
}


def pytest_collection_modifyitems(config, items):
    try:
        recorded = json.loads(
            (pathlib.Path(__file__).parent / "durations.json").read_text())
    except (OSError, ValueError):
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if (recorded.get(nodeid, 0.0) > _SLOW_THRESH_S
                and nodeid not in _ALWAYS_FAST):
            item.add_marker(pytest.mark.slow)


# ---------------------------------------------------------------------------
# Fast-lane runtime guard: durations.json is a snapshot, so a NEW expensive
# test silently lands in the fast lane until the snapshot is refreshed.  This
# hook measures every test at runtime and reports unmarked tests that exceeded
# the budget, so the <5-min signal can't silently degrade.  Runtime varies by
# machine (the recorded threshold is 5.5 s on the reference box), so the
# runtime bar is looser: 10 s.  PTPU_ENFORCE_FAST_LANE=1 turns the report into
# a hard session failure (for CI-style runs).
# ---------------------------------------------------------------------------
_RUNTIME_SLOW_S = 10.0
_runtime_overages: list[tuple[str, float]] = []


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    rep = outcome.get_result()
    if rep.when != "call" or rep.duration <= _RUNTIME_SLOW_S:
        return
    if item.get_closest_marker("slow") is None \
            and item.nodeid.replace("\\", "/") not in _ALWAYS_FAST:
        _runtime_overages.append((item.nodeid, rep.duration))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if not _runtime_overages:
        return
    terminalreporter.section("fast-lane overages (unmarked slow tests)")
    for nodeid, dur in sorted(_runtime_overages, key=lambda t: -t[1]):
        terminalreporter.write_line(f"  {dur:7.1f}s  {nodeid}")
    terminalreporter.write_line(
        "Refresh tests/durations.json (full run with --durations=0) or mark "
        "these @pytest.mark.slow to keep the fast lane under 5 minutes.")


def pytest_sessionfinish(session, exitstatus):
    if _runtime_overages and os.environ.get("PTPU_ENFORCE_FAST_LANE") == "1":
        session.exitstatus = 3


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
