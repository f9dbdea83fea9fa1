#!/usr/bin/env python3
"""Marginal-cost microbench harness for single ops on the axon terminal.

Standalone microbenches here carry a large, VARIABLE dispatch overhead
(~30-90 ms tunnel round trip per execute), which the old fixed-offset
harness (`(best - 0.05) / reps`) mis-subtracts — it produced a *negative*
per-op time on a cheap op (r4, ROUND_NOTES session 4).  This harness
instead times the SAME jitted fori_loop program at two rep counts and
reports the marginal cost per added rep:

    marginal = (t(reps_hi) - t(reps_lo)) / (reps_hi - reps_lo)

Dispatch overhead and its jitter cancel exactly; what remains is the
per-iteration device time of ``fn`` PLUS the harness's own per-iteration
work — the jnp.roll of the first operand (a full copy) and an f32
reduction of every output.  ``marginal_ms`` measures that roll+reduce
overhead with an identity ``fn`` on the same operands and subtracts it,
so the returned figure is the op alone (``subtract_overhead=False``
reverts to the raw marginal).  A/B comparisons are valid either way —
both arms share the overhead.

Usage (library):
    from tools.marginal_bench import marginal_ms
    ms = marginal_ms(lambda x, w: x @ w, x, w)          # ms per call
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _total_s(fn, reps: int, args, n_best: int = 5) -> float:
    """Best-of-n wall time of one jitted program running ``fn`` reps times,
    rolling the first argument each iteration and reducing every output to
    one scalar (a host scalar read is the only reliable completion barrier
    over the tunnel)."""

    @jax.jit
    def prog(*a):
        def body(i, acc):
            r = fn(jnp.roll(a[0], i, axis=0), *a[1:])
            leaves = jax.tree_util.tree_leaves(r)
            return acc + sum(x.astype(jnp.float32).sum() for x in leaves)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(prog(*args))  # compile + warm
    best = float("inf")
    for _ in range(n_best):
        t0 = time.perf_counter()  # monotonic; time.time() NTP slews can
        float(prog(*args))        # perturb ~100 ms best-of-n minima
        best = min(best, time.perf_counter() - t0)
    return best


def _raw_marginal_ms(fn, args, reps_lo, reps_hi, n_best) -> float:
    t_lo = _total_s(fn, reps_lo, args, n_best)
    t_hi = _total_s(fn, reps_hi, args, n_best)
    return (t_hi - t_lo) / (reps_hi - reps_lo) * 1e3


def marginal_ms(fn, *args, reps_lo: int = 8, reps_hi: int = 32,
                n_best: int = 5, subtract_overhead: bool = True) -> float:
    """Per-call device ms of ``fn(*args)`` with dispatch cancelled and the
    harness's roll+reduce overhead measured (identity fn) and subtracted."""
    ms = _raw_marginal_ms(fn, args, reps_lo, reps_hi, n_best)
    if subtract_overhead:
        ms -= _raw_marginal_ms(lambda *a: a[0], args, reps_lo, reps_hi,
                               n_best)
    return max(ms, 0.0)


if __name__ == "__main__":
    # self-check at a known geometry: a (8192, 1280) @ (1280, 1280) bf16
    # matmul = 27 GFLOP -> ~0.15 ms at the 190 TF/s calibrated peak
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8192, 1280)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((1280, 1280)), jnp.bfloat16)
    ms = marginal_ms(lambda a, b: a @ b, x, w)
    gflop = 2 * 8192 * 1280 * 1280 / 1e9
    # GFLOP per ms == TFLOP per s, same number
    print(f"matmul marginal: {ms:.3f} ms = {gflop / ms:.0f} TF/s")
