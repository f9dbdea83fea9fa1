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
        kind = i % 3
        if kind == 0:  # anatomy-like smooth blobs
            coarse = rng.standard_normal((16, 16))
            up = np.kron(coarse, np.ones((side // 16, side // 16)))
            for _ in range(2):
                up = (np.roll(up, 1, 0) + np.roll(up, -1, 0) +
                      np.roll(up, 1, 1) + np.roll(up, -1, 1) + up) / 5
            m = (up > np.quantile(up, 0.8)).astype(np.int32)
        elif kind == 1:  # serpentine: worst case for the fixpoint
            m = np.zeros((side, side), np.int32)
            for r in range(8, side - 8, 16):
                m[r:r + 8, 8:side - 8] = 1
            for j, r in enumerate(range(8, side - 24, 16)):
                if j % 2 == 0:
                    m[r:r + 24, side - 16:side - 8] = 1
                else:
                    m[r:r + 24, 8:16] = 1
        else:  # speckle noise: many tiny components
            m = (rng.random((side, side)) > 0.7).astype(np.int32)
        masks.append(m)
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
        best = min(best, time.time() - t0)
    print(f"{name}: {(best - 0.05) / masks.shape[0] * 1000:.2f} ms/mask "
          f"(wall {best * 1000:.0f} ms / {masks.shape[0]}, compile {comp:.0f}s)",
          flush=True)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from protosam_tpu.ops.cca_pallas import label_components_pallas

    print("devices:", jax.devices(), flush=True)
    masks = make_masks(k)
    jm = jnp.asarray(masks)

    # numerics: the two chip variants must agree exactly (each is
    # separately bit-checked vs the XLA path in tests + tpu_suite)
    a = np.asarray(label_components_pallas(jm[1], interpret=False,
                                           use_scratch=True))
    b = np.asarray(label_components_pallas(jm[1], interpret=False,
                                           use_scratch=False))
    print("variants equal on serpentine:", np.array_equal(a, b), flush=True)

    bench("scratch static-shift", lambda m: label_components_pallas(
        m, interpret=False, use_scratch=True), jm)
    bench("fori dynamic-roll   ", lambda m: label_components_pallas(
        m, interpret=False, use_scratch=False), jm)


if __name__ == "__main__":
    main()
