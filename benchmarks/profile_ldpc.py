#!/usr/bin/env python
"""Single-chip performance characterization of the flagship workloads.

Times the B=256 LDPC train step and the RPGM-hop inference step on the
attached device, pulls XLA's compiled cost analysis (FLOPs / bytes
accessed), and prints a roofline breakdown: arithmetic intensity, MFU vs
the chip's peak matmul throughput, and achieved HBM bandwidth vs peak.
Optionally writes a jax.profiler trace (--trace DIR) for op-level study in
TensorBoard/Perfetto.

Peak numbers are taken from the public TPU spec table for the detected
device kind (see jax-ml.github.io/scaling-book); unknown kinds print
absolute numbers only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (peak_matmul_flops_per_s at the default f32-in/bf16-multiply MXU mode,
#  peak_hbm_bytes_per_s)
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),   # v5e: 197 TF/s bf16, 819 GB/s
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e
}


def _readback(x):
    import jax

    return float(jax.tree.leaves(x)[0].ravel()[0])


def time_fn(step, iters=30, trials=3):
    state = step()           # warmup/compile
    _readback(state)
    t0 = time.perf_counter()
    _readback(state)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = step()
        _readback(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def report(name, dt, flops, bytes_acc, edges, device_kind):
    ai = flops / max(bytes_acc, 1.0)
    row = {
        "workload": name,
        "ms_per_step": round(dt * 1e3, 3),
        "edges_per_s": round(edges / dt, 1),
        "gflops_per_step": round(flops / 1e9, 2),
        "mb_accessed_per_step": round(bytes_acc / 1e6, 1),
        "arithmetic_intensity_flops_per_byte": round(ai, 2),
        "achieved_tflops_per_s": round(flops / dt / 1e12, 3),
        "achieved_hbm_gb_per_s": round(bytes_acc / dt / 1e9, 1),
    }
    peaks = PEAKS.get(device_kind)
    if peaks:
        pf, pb = peaks
        row["mfu_pct"] = round(100 * flops / dt / pf, 2)
        row["hbm_util_pct"] = round(100 * bytes_acc / dt / pb, 1)
        row["roofline_bound"] = (
            "compute" if ai > pf / pb else "memory/latency")
        # time lower bounds implied by the roofline
        row["compute_floor_ms"] = round(1e3 * flops / pf, 3)
        row["hbm_floor_ms"] = round(1e3 * bytes_acc / pb, 3)
    print(json.dumps(row))
    return row


def ldpc_workload(batch_size):
    import jax

    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.models import LDPCModel
    from fgnn_tpu.train.ldpc import create_state, make_train_step

    ds = ContinuousCodesSP(length=batch_size, seed=0)
    batch = jax.device_put(next(ds.batches(batch_size)))
    model = LDPCModel()
    state, tx = create_state(model, batch)
    train_step = make_train_step(model, tx)
    lowered = jax.jit(train_step).lower(state, batch)
    compiled = lowered.compile()

    holder = {"state": state}

    def step():
        holder["state"], m = train_step(holder["state"], batch)
        return m["loss"]

    n_layers = len(model.dim_mapping_list) - 1
    edges = (96 * 3 + 48 * 6 + 96 + 96) * n_layers * batch_size
    return step, compiled, edges


def rpgm_workload(batch_size, L=30, hop=9):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.data.tables import high_factor_table, pw_factor_table
    from fgnn_tpu.models import SynHopFactorModel

    rng = np.random.RandomState(0)
    nn_pw, ef_pw = pw_factor_table(L)
    nn_hi, ef_hi = high_factor_table(L, hop)
    x = jnp.asarray(rng.rand(batch_size, L, 2).astype(np.float32))
    pws = jnp.asarray(rng.rand(batch_size, L, 4).astype(np.float32))
    hops = jnp.asarray(rng.rand(batch_size, L, hop).astype(np.float32))
    args = (x, pws, hops)
    # graph tables ride the CLOSURE as trace-time constants, exactly like
    # the trainers and bench.py: passing them as jit arguments makes them
    # tracers, which disables the fused kernel and the concrete-table
    # shortcuts and profiles a path no real flow uses (measured 23.5 ms
    # vs ~7 ms at B=256 — an r5 harness bug, not a model regression)
    tables = (nn_pw, ef_pw, nn_hi, ef_hi)

    model = SynHopFactorModel(hop_order=hop)
    variables = jax.jit(
        lambda v, *a: model.init(v, *a, *tables, train=False))(
        jax.random.PRNGKey(0), *args)
    fwd = jax.jit(lambda v, *a: model.apply(v, *a, *tables, train=False))
    compiled = fwd.lower(variables, *args).compile()

    def step():
        return fwd(variables, *args)

    # 6 message-passing layers (the others are pointwise fallbacks, see
    # factor_mpnn layer-selection rule) x (pw 2L*2 + high 2L*9 edges)
    edges = 6 * (2 * L * 2 + 2 * L * hop) * batch_size
    return step, compiled, edges


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--trace", default=None, help="jax.profiler trace dir")
    p.add_argument("--workload", choices=["ldpc", "rpgm", "both"],
                   default="both")
    args = p.parse_args()

    import jax

    from fgnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    kind = jax.devices()[0].device_kind
    print(f"# device: {jax.devices()[0].platform} {kind}", file=sys.stderr)

    workloads = []
    if args.workload in ("ldpc", "both"):
        workloads.append(("ldpc_train_b%d" % args.batch,
                          ldpc_workload(args.batch)))
    if args.workload in ("rpgm", "both"):
        workloads.append(("rpgm_hop_infer_b%d" % args.batch,
                          rpgm_workload(args.batch)))

    for name, (step, compiled, edges) in workloads:
        dt = time_fn(step, iters=args.iters)
        flops, bytes_acc = cost(compiled)
        report(name, dt, flops, bytes_acc, edges, kind)
        if args.trace:
            with jax.profiler.trace(args.trace):
                for _ in range(5):
                    out = step()
                _readback(out)


if __name__ == "__main__":
    main()
