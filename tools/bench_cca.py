#!/usr/bin/env python3
"""On-chip microbench of the CCA Pallas kernel variants at 1024².

Times K masks inside one jitted program (lax.scan over a stacked batch of
distinct anatomy-like masks, so the terminal's execution cache and the
per-dispatch tunnel RT don't pollute the numbers) and cross-checks labels
vs the XLA implementation on two of them.  Usage: python tools/bench_cca.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_masks(k, side=1024, seed=0):
    """Anatomy-like smooth blobs (same recipe family as bench.py's volume):
    threshold of low-frequency noise -> a few large smooth components."""
    rng = np.random.default_rng(seed)
    masks = []
    for i in range(k):
        coarse = rng.standard_normal((16, 16))
        up = np.kron(coarse, np.ones((side // 16, side // 16)))
        # cheap smoothing: two box passes
        for _ in range(2):
            up = (np.roll(up, 1, 0) + np.roll(up, -1, 0) +
                  np.roll(up, 1, 1) + np.roll(up, -1, 1) + up) / 5
        masks.append((up > np.quantile(up, 0.8)).astype(np.int32))
    return np.stack(masks)


def bench(name, fn, masks, reps_outer=3):
    @jax.jit
    def prog(ms, shift):
        # ``shift`` permutes the batch so successive calls are distinct
        # executions — the axon terminal replays byte-identical executions
        # from a cache (ADVICE r1 / ROUND_NOTES measurement rules).
        ms = jnp.roll(ms, shift, axis=0)
        def body(acc, m):
            lbl = fn(m)
            return acc + jnp.sum(lbl & 1023), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), ms)
        return acc

    t0 = time.time(); float(prog(masks, jnp.int32(99))); comp = time.time() - t0
    best = 1e9
    for r in range(reps_outer):
        t0 = time.time(); float(prog(masks, jnp.int32(r)))
        best = min(best, (time.time() - t0 - 0.05) / masks.shape[0] * 1000)
    print(f"{name}: {best:.2f} ms/mask (compile {comp:.0f}s)", flush=True)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from protosam_tpu.ops.cca import _label_components_xla
    from protosam_tpu.ops.cca_pallas import label_components_pallas

    print("devices:", jax.devices(), flush=True)
    masks = make_masks(k)
    jm = jnp.asarray(masks)

    # numerics: chip kernel vs CPU XLA on 2 masks
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        ref0 = np.asarray(_label_components_xla(jnp.asarray(masks[0])))
    for use_scratch in (True, False):
        got = np.asarray(label_components_pallas(
            jm[0], interpret=False, use_scratch=use_scratch))
        print(f"scratch={use_scratch}: equal={np.array_equal(got, ref0)}",
              flush=True)

    bench("scratch static-shift", lambda m: label_components_pallas(
        m, interpret=False, use_scratch=True), jm)
    bench("fori dynamic-roll   ", lambda m: label_components_pallas(
        m, interpret=False, use_scratch=False), jm)


if __name__ == "__main__":
    main()
