"""Data-loader lifecycle and determinism tests (ADVICE round-1 items)."""

import itertools
import time

import numpy as np
import pytest

from fgnn_tpu.data.loader import PoolBatcher, Prefetcher, prefetch


def test_prefetcher_close_unblocks_worker():
    """Abandoning a prefetcher mid-stream must not leave the worker thread
    blocked on a full queue pinning staged batches."""
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    pf = Prefetcher(gen(), depth=2)
    it = iter(pf)
    assert next(it) == 0
    pf.close()
    assert not pf._t.is_alive()
    # worker stopped long before exhausting the source
    assert len(produced) < 20


def test_prefetcher_context_manager_partial_consumption():
    with prefetch(iter(range(100)), depth=2) as pf:
        got = list(itertools.islice(iter(pf), 3))
    assert got == [0, 1, 2]
    assert not pf._t.is_alive()


class _TinyDS:
    """Picklable sample source driven by .rng (PoolBatcher contract)."""

    def __init__(self):
        self.rng = np.random.RandomState(0)

    def sample(self):
        return {"x": self.rng.uniform(size=3).astype(np.float32)}


def test_pool_batcher_deterministic_across_worker_counts():
    streams = []
    for n_workers in (1, 3):
        with PoolBatcher(_TinyDS, batch_size=4, n_workers=n_workers,
                         seed=7) as pb:
            streams.append([b["x"] for b in pb.batches(3)])
    for a, b in zip(*streams):
        np.testing.assert_array_equal(a, b)


def test_pool_batcher_seed_changes_stream():
    with PoolBatcher(_TinyDS, batch_size=4, n_workers=2, seed=7) as p1, \
         PoolBatcher(_TinyDS, batch_size=4, n_workers=2, seed=8) as p2:
        a = next(p1.batches(1))["x"]
        b = next(p2.batches(1))["x"]
    assert not np.array_equal(a, b)


def test_checkpoint_version_mismatch_raises(tmp_path):
    import pickle

    import jax.numpy as jnp

    from fgnn_tpu.train.common import (
        TrainState, load_checkpoint, make_optimizer, save_checkpoint)

    params = {"w": jnp.ones((3, 3))}
    tx = make_optimizer(1e-3)
    state = TrainState(params=params, batch_stats={},
                       opt_state=tx.init(params),
                       gcnt=jnp.asarray(0, jnp.int32))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=1)

    # round-trips at the current version
    restored, epoch, _ = load_checkpoint(path, state)
    assert epoch == 1

    # a future/unknown version fails with a clear error
    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload["format_version"] = 999
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="format version"):
        load_checkpoint(path, state)


def test_checkpoint_opt_layout_mismatch_raises(tmp_path, monkeypatch):
    """r5: per-leaf ('tree') vs optax.flatten ('flat') opt_state layouts
    cannot be restored into each other; the loader names the fix
    (FGNN_OPT_FLATTEN) instead of failing with a leaf-count mismatch.
    Untagged r2-r4 checkpoints are treated as 'flat'."""
    import pickle

    import jax.numpy as jnp

    from fgnn_tpu.train.common import (
        TrainState, load_checkpoint, make_optimizer, save_checkpoint)

    def make_state(flatten):
        monkeypatch.setenv("FGNN_OPT_FLATTEN", "1" if flatten else "0")
        params = {f"w{i}": jnp.ones((3, 3)) for i in range(4)}
        tx = make_optimizer(1e-3)
        return TrainState(params=params, batch_stats={},
                          opt_state=tx.init(params),
                          gcnt=jnp.asarray(0, jnp.int32))

    flat_state = make_state(True)
    tree_state = make_state(False)
    path = str(tmp_path / "flat.ckpt")
    save_checkpoint(path, flat_state, epoch=3)

    with pytest.raises(ValueError, match="FGNN_OPT_FLATTEN"):
        load_checkpoint(path, tree_state)
    restored, epoch, _ = load_checkpoint(path, flat_state)
    assert epoch == 3

    # untagged (r2-r4) checkpoints default to 'flat'
    with open(path, "rb") as f:
        payload = pickle.load(f)
    del payload["opt_layout"]
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="FGNN_OPT_FLATTEN"):
        load_checkpoint(path, tree_state)
    restored, epoch, _ = load_checkpoint(path, flat_state)
    assert epoch == 3


def test_prefetcher_fast_producer_slow_consumer_terminates():
    """Regression: when the producer finishes while the bounded queue is
    full (fast producer, consumer stalled e.g. in a jit compile), the done
    marker must still arrive — put_nowait used to drop it, deadlocking the
    consumer's blocking get()."""
    import threading
    import time

    from fgnn_tpu.data.loader import Prefetcher

    got = []

    def consume():
        p = Prefetcher(iter(range(10)), depth=2)
        time.sleep(0.3)  # let the producer finish against a full queue
        for item in p:
            got.append(item)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive(), "Prefetcher consumer deadlocked"
    assert got == list(range(10))
