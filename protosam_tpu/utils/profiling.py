"""First-class tracing/profiling (SURVEY.md §5: the reference only has
commented-out time.time() prints, models/ProtoSAM.py:543-667).

* ``StageTimer`` — named wall-clock stages with device sync, accumulated
  stats and a one-line report.
* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
* ``annotate`` — TraceAnnotation wrapper so stages show up inside the
  device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {t * 1000:.1f} ms total, "
                         f"{t / max(n, 1) * 1000:.2f} ms/call x{n} "
                         f"({100 * t / max(total, 1e-9):.0f}%)")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"total_s": v, "calls": self.counts[k]}
                for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace for TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces."""
    return jax.profiler.TraceAnnotation(name)
