"""Tests for logging/profiling/debug utilities."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fgnn_tpu.utils import (
    MetricsWriter,
    StepTimer,
    check_finite,
    deterministic,
    device_memory_stats,
)


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["value"] for l in lines] == [0.5, 0.25]
    assert lines[0]["tag"] == "train/loss"


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.step(n_edges=100, n_samples=2)
    s = t.snapshot()
    assert s["edges_per_s"] > 0
    assert abs(s["edges_per_s"] / s["samples_per_s"] - 50) < 1e-6
    t.reset()
    assert t.snapshot()["steps_per_s"] == 0


def test_check_finite_flags_bad_leaf():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    check_finite(good)  # no raise
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError) as e:
        check_finite(bad, "grads")
    assert "c" in str(e.value)


def test_deterministic_seeds():
    k1 = deterministic(7)
    a = np.random.rand(3)
    k2 = deterministic(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU
