#!/usr/bin/env python
"""Single-process perf sweep of the LDPC train step across backends/configs.

Usage: python benchmarks/sweep.py   (runs on whatever jax.devices() offers)
Prints step time and edges/s for each configuration; use it to pick the
bench.py defaults.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(train_step, state, batch, iters=20):
    state2, m = train_step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, m = train_step(s, batch)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters


def main():
    import fgnn_tpu.ops.typed_mp as tm
    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.models import LDPCModel
    from fgnn_tpu.models.policy import compute_dtype
    from fgnn_tpu.train.ldpc import create_state, make_train_step

    B = int(os.environ.get("FGNN_BENCH_BATCH", "256"))
    ds = ContinuousCodesSP(length=B, seed=0)
    batch = next(ds.batches(B))
    edges_per_step = (96 * 3 + 48 * 6 + 96 + 96) * 8 * B

    model = LDPCModel()
    state, tx = create_state(model, batch)

    configs = [
        ("xla-f32", None, None),
        ("pallas-G1-f32", "1", "1"),
        ("pallas-G4-f32", "1", "4"),
        ("xla-bf16", "0", None),
        ("pallas-G1-bf16", "1", "1"),
    ]
    for name, use_pallas, tile in configs:
        tm._PALLAS_ENV = use_pallas if use_pallas is not None else "0"
        if tile is not None:
            os.environ["FGNN_PALLAS_BATCH_TILE"] = tile
        ctx = compute_dtype(jnp.bfloat16) if name.endswith("bf16") else None
        try:
            if ctx:
                ctx.__enter__()
            step = make_train_step(model, tx)  # fresh jit per config
            dt = measure(step, state, batch)
            print(f"{name:18s} {dt * 1e3:8.2f} ms/step "
                  f"{edges_per_step / dt / 1e6:9.1f} M edges/s", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        finally:
            if ctx:
                ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()
