"""Profiling & observability helpers (SURVEY.md §5: the reference has none;
this is the TPU-native replacement).

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace directory.
* :class:`StepTimer` — wall-clock + throughput (edges/s, samples/s)
  counters for train loops.
* :func:`annotate` — named TraceAnnotation for device-side op attribution.
* :func:`device_memory_stats` — per-device live-bytes snapshot.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return stats


@dataclass
class StepTimer:
    """Throughput counter: call .step(n_edges, n_samples) once per step."""

    window: int = 50
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0
    _edges: int = 0
    _samples: int = 0

    def step(self, n_edges: int = 0, n_samples: int = 0):
        self._steps += 1
        self._edges += n_edges
        self._samples += n_samples

    def snapshot(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        out = {
            "steps_per_s": self._steps / dt,
            "edges_per_s": self._edges / dt,
            "samples_per_s": self._samples / dt,
        }
        return out

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = self._edges = self._samples = 0


def enable_compilation_cache(path: str = ""):
    """Enable JAX's persistent compilation cache.

    On a tunneled TPU with remote compile, the first jit of the LDPC train
    step costs ~60-90 s per process; the on-disk cache cuts repeat starts
    to seconds.  Respects an existing JAX_COMPILATION_CACHE_DIR.
    """
    import os

    import jax

    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.expanduser("~/.cache/fgnn_tpu/jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort, never fail a run over it
        pass
