"""Double-buffered host→HBM prefetch (BASELINE north star: the input
pipeline must never stall the encoders).

``device_prefetch`` wraps any host-side batch iterator: while the device
computes on batch i, batch i+1 is already being transferred
(jax.device_put is async).  ``VolumePrefetcher`` additionally overlaps the
host-side NIfTI decode/augmentation in a worker thread.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Iterable, Iterator

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    device=None) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``size`` transfers in flight."""
    buf = collections.deque()

    def put(x):
        return jax.device_put(x, device) if device is not None else \
            jax.device_put(x)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(jax.tree.map(put, next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.tree.map(put, next(it)))
        except StopIteration:
            pass
        yield out


class VolumePrefetcher:
    """Producer thread decoding/assembling host batches + async device_put.

    produce_fn(i) -> pytree of numpy arrays for step i (None to stop).
    """

    def __init__(self, produce_fn: Callable[[int], Any], n_steps: int,
                 depth: int = 2, device=None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.device = device
        self._thread = threading.Thread(
            target=self._work, args=(produce_fn, n_steps), daemon=True)
        self._thread.start()

    def _work(self, produce_fn, n_steps):
        for i in range(n_steps):
            batch = produce_fn(i)
            if batch is None:
                break
            self.q.put(jax.tree.map(
                lambda x: jax.device_put(x, self.device)
                if self.device is not None else jax.device_put(x), batch))
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item
