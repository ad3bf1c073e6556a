"""Host-side data loading utilities.

The reference hides data-synthesis latency behind torch DataLoader worker
processes (train_ldpc.py:154-158).  The TPU-native equivalent: a
background-thread prefetcher that keeps a bounded queue of ready batches
while the accelerator steps, plus a pool-backed batch generator for
CPU-heavy sample synthesis (the RPGM oracles).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    """Wrap a batch iterator with a bounded background-thread prefetch."""

    def __init__(self, it: Iterator, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._done)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch(it: Iterator, depth: int = 4) -> Iterator:
    """`for batch in prefetch(ds.batches(bs)):` — overlapped generation."""
    return iter(Prefetcher(it, depth))


def device_prefetch(it: Iterator, depth: int = 3) -> Iterator:
    """Prefetch batches AND stage them on the default device.

    The device_put runs in the prefetch thread, so the host->device
    transfer (expensive over a remote-device transport) overlaps with the
    accelerator executing the previous step instead of serializing in
    front of every dispatch.
    """
    import jax

    def staged():
        for b in it:
            yield jax.device_put(b)

    return iter(Prefetcher(staged(), depth))


class PoolBatcher:
    """Multiprocess batch synthesis for CPU-bound sample generators.

    ``make_dataset`` must be a picklable zero-arg callable returning an
    object with ``.sample()`` (seeded per worker); batches are assembled
    round-robin from worker-produced samples.
    """

    def __init__(self, make_dataset: Callable, batch_size: int,
                 n_workers: int = 4, seed: int = 0):
        import multiprocessing as mp

        self.batch_size = batch_size
        self._ctx = mp.get_context("fork")
        self._pool = self._ctx.Pool(
            n_workers, initializer=_pool_init,
            initargs=(make_dataset, seed))
        self._n = n_workers

    def batches(self, n_batches: int) -> Iterator[dict]:
        import numpy as np

        for _ in range(n_batches):
            items = self._pool.map(_pool_sample, range(self.batch_size))
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}

    def close(self):
        self._pool.terminate()


_POOL_DS = None


def _pool_init(make_dataset, seed):
    global _POOL_DS
    import os

    import numpy as np

    np.random.seed((seed + os.getpid()) % (2 ** 31))
    _POOL_DS = make_dataset()
    if hasattr(_POOL_DS, "rng"):
        _POOL_DS.rng = np.random.RandomState((seed + os.getpid()) % (2 ** 31))


def _pool_sample(_):
    return _POOL_DS.sample()
