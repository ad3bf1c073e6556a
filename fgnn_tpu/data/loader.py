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
    """Wrap a batch iterator with a bounded background-thread prefetch.

    Supports early termination: ``close()`` (or leaving a ``with`` block,
    or simply dropping the iterator mid-stream and iterating a new one)
    unblocks the worker thread so it does not pin ``depth`` staged batches
    for the life of the process.
    """

    def __init__(self, it: Iterator, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def worker():
            try:
                for item in it:
                    # bounded-timeout put so a stop request is noticed even
                    # when the consumer has gone away and the queue is full
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                # The done marker must use the same stop-aware bounded
                # retry as items: with a fast producer and a slow consumer
                # the queue is often FULL when the iterator ends, and a
                # put_nowait would silently drop the marker, deadlocking
                # the consumer's blocking get() forever.
                while not self._stop.is_set():
                    try:
                        self._q.put(self._done, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, "_finished", False):
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            self._finished = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker and drain staged items (idempotent)."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._t.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def prefetch(it: Iterator, depth: int = 4) -> Prefetcher:
    """`for batch in prefetch(ds.batches(bs)):` — overlapped generation."""
    return Prefetcher(it, depth)


def device_prefetch(it: Iterator, depth: int = 3,
                    put: Optional[Callable] = None) -> Prefetcher:
    """Prefetch batches AND stage them on the default device.

    The device_put runs in the prefetch thread, so the host->device
    transfer (expensive over a remote-device transport) overlaps with the
    accelerator executing the previous step instead of serializing in
    front of every dispatch.  ``put`` overrides the placement (e.g. the
    mesh-sharding put from ``prepare_mesh_training``).
    """
    import jax

    put = put or jax.device_put

    def staged():
        for b in it:
            yield put(b)

    return Prefetcher(staged(), depth)


class PoolBatcher:
    """Multiprocess batch synthesis for CPU-bound sample generators.

    ``make_dataset`` must be a picklable zero-arg callable returning an
    object with ``.sample()``.  Every sample is drawn from an RNG derived
    from ``(seed, global sample index)``, so a fixed ``seed`` reproduces
    the exact stream regardless of worker count or scheduling.
    """

    def __init__(self, make_dataset: Callable, batch_size: int,
                 n_workers: int = 4, seed: int = 0):
        import multiprocessing as mp

        self.batch_size = batch_size
        self.seed = seed
        self._ctx = mp.get_context("fork")
        self._pool = self._ctx.Pool(
            n_workers, initializer=_pool_init, initargs=(make_dataset,))
        self._n = n_workers
        self._cursor = 0  # global sample counter -> per-sample seeds

    def batches(self, n_batches: int) -> Iterator[dict]:
        import numpy as np

        for _ in range(n_batches):
            seeds = [(self.seed, self._cursor + i)
                     for i in range(self.batch_size)]
            self._cursor += self.batch_size
            items = self._pool.map(_pool_sample, seeds)
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}

    def close(self):
        self._pool.terminate()
        self._pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


_POOL_DS = None


def _pool_init(make_dataset):
    global _POOL_DS
    _POOL_DS = make_dataset()


def _pool_sample(seed_idx):
    import numpy as np

    base_seed, idx = seed_idx
    # deterministic per-sample stream independent of worker assignment
    ss = np.random.SeedSequence([base_seed, idx])
    _POOL_DS.rng = np.random.RandomState(ss.generate_state(1)[0] % (2**31))
    return _POOL_DS.sample()
