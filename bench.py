#!/usr/bin/env python
"""fgnn_tpu benchmark — edges/s on the flagship workloads.

Prints one JSON line per workload, the LAST being the driver-tracked
flagship LDPC train-step metric:
  {"metric": "edges_per_s", "value": N, "unit": "edges/s", "vs_baseline": N}

The preceding line reports BASELINE.md's primary metric — edges/s on
RPGM MAP inference (the SynHopFactorModel forward at the reference
configuration, metric "rpgm_edges_per_s").

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


def _time_steps(step, iters):
    """Best-of-5 per-step time with one forced readback per trial and the
    bare readback round-trip subtracted (see methodology note above).
    Five trials (r5, was 3): run-to-run variance through the tunnel is
    ±5-10%, and the best-of estimator needs more draws to stabilize."""
    out = step()
    _readback(out)
    t0 = time.perf_counter()
    _readback(out)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step()
        _readback(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best


def bench_rpgm(batch_size, iters, L=30, hop=9):
    """BASELINE.md primary metric: edges/s on RPGM MAP inference
    (SynHopFactorModel forward, reference configuration)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.data.tables import high_factor_table, pw_factor_table
    from fgnn_tpu.models import SynHopFactorModel

    rng = np.random.RandomState(0)
    nn_pw, ef_pw = pw_factor_table(L)
    nn_hi, ef_hi = high_factor_table(L, hop)
    data = (jnp.asarray(rng.rand(batch_size, L, 2).astype(np.float32)),
            jnp.asarray(rng.rand(batch_size, L, 4).astype(np.float32)),
            jnp.asarray(rng.rand(batch_size, L, hop).astype(np.float32)))
    # graph tables ride the CLOSURE (trace-time constants), like the
    # trainers — the fused kernel needs concrete tables to build its
    # one-hot operator
    tables = (nn_pw, ef_pw, nn_hi, ef_hi)
    model = SynHopFactorModel(hop_order=hop)
    variables = jax.jit(lambda v, *a: model.init(v, *a, *tables,
                                                 train=False))(
        jax.random.PRNGKey(0), *data)
    fwd = jax.jit(lambda v, *a: model.apply(v, *a, *tables, train=False))
    dt = _time_steps(lambda: fwd(variables, *data), iters)
    # 6 message-passing layers (the rest of the 10 dim transitions are
    # pointwise fallbacks per the factor_mpnn layer rule) x joint-graph
    # edges per type (pw: 2L dsts x K=2; hop: 2L x K=9)
    edges = 6 * (2 * L * 2 + 2 * L * hop) * batch_size
    return edges / dt


def bench_rpgm_train(batch_size, iters, L=30, hop=9):
    """edges/s on the RPGM-hop TRAIN step (forward + backward + Adam) —
    the reference's actual workload is training
    (/root/reference/train_syn_hop_factor.py:275-306); the inference
    number above keeps BASELINE.md's primary-metric definition."""
    import types

    import jax
    import numpy as np

    from fgnn_tpu.train.synthetic import (
        SynWorkload,
        create_state,
        make_train_step,
    )

    args = types.SimpleNamespace(chain_length=L, hop_order=hop, hop_cap=5,
                                 neighbour=8, model_name="mp_nn_factor",
                                 dims=None, seed=0, batch_size=batch_size)
    wl = SynWorkload("hop", args)
    rng = np.random.RandomState(0)
    batch = jax.device_put({
        "node_feature": rng.rand(batch_size, L, 2).astype(np.float32),
        "pws": rng.rand(batch_size, L, 4).astype(np.float32),
        "efeature_hop": rng.rand(batch_size, L, hop).astype(np.float32),
        "label": rng.randint(0, 2, (batch_size, L)).astype(np.int32),
        "lp_label": rng.randint(0, 2, (batch_size, L)).astype(np.int32),
    })
    state, tx = create_state(wl, batch, seed=0)
    step_fn = make_train_step(wl, tx)
    for _ in range(2):
        state, _ = step_fn(state, batch)
    holder = {"state": state}

    def step():
        holder["state"], m = step_fn(holder["state"], batch)
        return m["loss"]

    dt = _time_steps(step, iters)
    edges = 6 * (2 * L * 2 + 2 * L * hop) * batch_size
    return edges / dt


def main():
    import jax

    from fgnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.models import LDPCModel
    from fgnn_tpu.train.ldpc import create_state, make_train_step

    batch_size = int(os.environ.get("FGNN_BENCH_BATCH", "256"))
    iters = int(os.environ.get("FGNN_BENCH_ITERS", "30"))
    # The flagship training configuration uses the bfloat16 compute
    # policy (f32 params/stats/normalization statistics): it is the
    # TPU-native default and it TRAINED the best recorded LDPC BER
    # matrix (300-epoch run, RESULTS.md), so the driver-tracked metric
    # measures it.  FGNN_BENCH_BF16=0 pins full-f32 compute, and the
    # emitted line carries a "policy" field so the two are never
    # conflated (RESULTS.md records both).
    bf16 = os.environ.get("FGNN_BENCH_BF16", "1") == "1"
    if bf16:
        import jax.numpy as jnp

        from fgnn_tpu.models.policy import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    baselines = json.load(open(base_path)) if os.path.exists(base_path) else {}

    if os.environ.get("FGNN_BENCH_SKIP_RPGM") != "1":
        rpgm_eps = bench_rpgm(batch_size, iters)
        row = {
            "metric": "rpgm_edges_per_s",
            "value": round(rpgm_eps, 1),
            "unit": "edges/s",
        }
        if "rpgm_edges_per_s" in baselines:
            row["vs_baseline"] = round(
                rpgm_eps / baselines["rpgm_edges_per_s"], 4)
        print(json.dumps(row))

        rpgm_tr = bench_rpgm_train(batch_size, iters)
        row = {
            "metric": "rpgm_train_edges_per_s",
            "value": round(rpgm_tr, 1),
            "unit": "edges/s",
        }
        if "rpgm_train_edges_per_s" in baselines:
            row["vs_baseline"] = round(
                rpgm_tr / baselines["rpgm_train_edges_per_s"], 4)
        print(json.dumps(row))

    def bench_ldpc(use_bf16):
        import jax.numpy as jnp

        from fgnn_tpu.models.policy import set_compute_dtype

        set_compute_dtype(jnp.bfloat16 if use_bf16 else jnp.float32)
        ds = ContinuousCodesSP(length=batch_size, seed=0)
        batch = jax.device_put(next(ds.batches(batch_size)))
        model = LDPCModel()
        state, tx = create_state(model, batch)
        train_step = make_train_step(model, tx)
        n_layers = len(model.dim_mapping_list) - 1
        edges_per_step = (96 * 3 + 48 * 6 + 96 + 96) * n_layers * batch_size
        for _ in range(2):
            state, m = train_step(state, batch)
        holder = {"state": state}

        def step():
            holder["state"], m = train_step(holder["state"], batch)
            return m["loss"]

        return edges_per_step / _time_steps(step, iters)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_path):
        baseline = json.load(open(base_path))["edges_per_s"]
    else:
        baseline = None

    # BOTH policies every run (VERDICT r4 item 8: keep cross-round ratios
    # like-for-like): the f32 line first, then the flagship bf16-compute
    # line LAST (the driver tracks the final line; bf16 is the shipped
    # training configuration — it trained the best recorded BER matrix).
    # FGNN_BENCH_BF16=0 stops after f32 (the f32 line is then tracked).
    rows = [bench_ldpc(False)]
    policies = ["f32"]
    if bf16:
        rows.append(bench_ldpc(True))
        policies.append("bf16_compute")
    if baseline is None:
        baseline = rows[0]
        with open(base_path, "w") as f:
            json.dump({"edges_per_s": baseline,
                       "note": "first recorded run (f32)"}, f)
    for eps, pol in zip(rows, policies):
        print(json.dumps({
            "metric": "edges_per_s",
            "value": round(eps, 1),
            "unit": "edges/s",
            "policy": pol,
            "vs_baseline": round(eps / baseline, 4),
        }))


if __name__ == "__main__":
    main()
