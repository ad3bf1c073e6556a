#!/usr/bin/env python
"""fgnn_tpu benchmark — edges/s on the flagship LDPC FactorNN train step.

Prints ONE JSON line:
  {"metric": "edges_per_s", "value": N, "unit": "edges/s", "vs_baseline": N}

The metric counts typed-edge messages processed per second by the full
training step (forward + backward + Adam) of the reference-configuration
LDPCModel: per sample per FactorNN layer, f2v edges (96*3) + v2f (48*6) +
global-factor edges (96 + 96) = 768, times 8 layers = 6144 edges/sample.

Methodology (important on a tunneled TPU):
  * the batch is staged on device once (a real input pipeline overlaps
    host->device transfers with compute; we measure the compute path);
  * steps are chained through the carried train state and timed with a
    single forced host readback of the final loss — `block_until_ready`
    is NOT trusted (through the axon relay it can return before the work
    is done, which silently turns the timing into a dispatch-rate
    measurement);
  * the one readback round-trip (~25 ms over the relay) is amortized
    over `iters` steps and additionally subtracted using a measured
    empty-readback estimate.

vs_baseline: ratio against the value stored in bench_baseline.json, so
cross-round progress is tracked even though the reference repo publishes
no numbers (BASELINE.md).
"""

import json
import os
import time


def _readback(x):
    """Force a real host round-trip (do not trust block_until_ready)."""
    import jax

    return float(jax.tree.leaves(x)[0].ravel()[0])


def main():
    import jax

    from fgnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.models import LDPCModel
    from fgnn_tpu.train.ldpc import create_state, make_train_step

    batch_size = int(os.environ.get("FGNN_BENCH_BATCH", "256"))
    iters = int(os.environ.get("FGNN_BENCH_ITERS", "30"))
    if os.environ.get("FGNN_BENCH_BF16") == "1":
        import jax.numpy as jnp

        from fgnn_tpu.models.policy import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    ds = ContinuousCodesSP(length=batch_size, seed=0)
    batch = jax.device_put(next(ds.batches(batch_size)))

    model = LDPCModel()
    state, tx = create_state(model, batch)
    train_step = make_train_step(model, tx)

    # edge count per sample (messages through typed_mp_conv per layer)
    n_layers = len(model.dim_mapping_list) - 1
    edges_per_sample = (96 * 3 + 48 * 6 + 96 + 96) * n_layers
    edges_per_step = edges_per_sample * batch_size

    # warmup / compile, with forced readback
    for _ in range(3):
        state, m = train_step(state, batch)
    _readback(m["loss"])

    # estimate the bare readback round-trip so it can be subtracted
    t0 = time.perf_counter()
    _readback(m["loss"])
    rtt = time.perf_counter() - t0

    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch)
        _readback(m["loss"])
        dt = (time.perf_counter() - t0 - rtt) / iters
        best = min(best, dt)

    edges_per_s = edges_per_step / best

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_path):
        baseline = json.load(open(base_path))["edges_per_s"]
    else:
        baseline = edges_per_s
        with open(base_path, "w") as f:
            json.dump({"edges_per_s": edges_per_s,
                       "note": "first recorded run"}, f)

    print(json.dumps({
        "metric": "edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
