#!/usr/bin/env python
"""ICI roofline projection for the halo-exchange scaling mode.

The only multi-device fabric available in this environment is 8 VIRTUAL
CPU devices, which is a poor proxy for TPU ICI scaling in both
directions: the 8 "devices" share one host's physical cores (so sharded
compute barely parallelizes — a strong-scaling efficiency measured there
is bounded by core oversubscription, not by the algorithm), while
collectives are memcpys (so comm looks free).  This harness produces the
skeptic-auditable projection instead:

  1. EXACT per-device work decomposition from ``build_halo_plan`` for the
     scaling-bench graph: local/remote edge counts, halo rows H, and the
     all_to_all payload bytes per device = 2 * (D-1) * H * C * 4
     (send + receive, f32 rows).
  2. MEASURED single-chip kernel time of the per-shard computation (the
     exact ``body`` of ``halo_typed_mp_coo`` with the all_to_all replaced
     by its local equivalent) at each shard size, on the attached device.
  3. An ICI time model: payload / BW_eff, with BW_eff a conservative
     single-link v5e figure (45 GB/s one-way; the 2D-torus all_to_all has
     more than one link available, so this UNDERSTATES the fabric).

Projected step time bounds:
  optimistic (XLA overlaps the all_to_all with the local pipeline, which
  is how halo_typed_mp_coo is written):  max(t_local, t_comm) + t_remote
  pessimistic (zero overlap):            t_local + t_remote + t_comm

Efficiency is PER-SHARD-NORMALIZED (r5; the r4 t_1/(D*t_proj) strong-
scaling form produced >1 values because the single-device baseline pays
superlinear segment costs, which says nothing about the fabric):

  efficiency(D) = (t_local + t_remote) / t_proj(D)  in (0, 1] by
  construction — the fraction of the projected step the device spends on
  its own shard's compute, i.e. exactly what communication + non-overlap
  take away.  The raw t_1 / t_proj ratio is still reported as
  ``speedup_vs_single`` (it may exceed D on this graph because the
  single-device segment reduction is superlinear in segment count — a
  property of the baseline, not of scaling).

``--preset ldpc-flagship`` projects the FLAGSHIP workload: the batch-as-
giant-graph disjoint union of 4096 LDPC code graphs (the f2v conv:
96-var destinations, 48-check sources, K=3, T=4), block-partitioned so
whole codes stay on one shard.  Writes one JSON blob for RESULTS.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

V5E_ICI_GBPS = 45.0  # one-way per-link, conservative (public spec ~50)


def _readback(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    _readback(out)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _readback(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    # the RTT subtraction can push sub-RTT kernels negative; clamp
    return max(best, 0.0)


def make_graph(args, rng):
    src = rng.randint(0, args.nodes, args.edges)
    if args.locality:
        dst = np.clip(src + rng.randint(-args.locality, args.locality + 1,
                                        args.edges), 0, args.dst_nodes - 1)
    else:
        dst = rng.randint(0, args.dst_nodes, args.edges)
    et = rng.randn(args.edges, args.etypes).astype(np.float32)
    x = rng.randn(args.nodes, args.cin).astype(np.float32)
    W = (rng.randn(args.cin, args.cout * args.etypes) * 0.1).astype(
        np.float32)
    return x, src, dst, et, W


def shard_kernel_time(args, plan, x, et, W):
    """Measured single-device time of ONE shard's computation (the
    halo_typed_mp_coo body with the received halo rows materialized
    locally — identical FLOPs/bytes, no collective)."""
    from fgnn_tpu.ops.segment import segment_max

    D, Ns, Nd, H = plan.n_shards, plan.src_block, plan.dst_block, plan.halo
    et_loc, et_rem = plan.shard_edge_data(et)
    d = 0  # shard 0 is representative (EL/ER are padded to the max anyway)
    x_l = jnp.asarray(np.resize(x, (Ns, args.cin)))
    recv = jnp.asarray(np.resize(x, (D * H, args.cin)))
    sl = jnp.asarray(plan.src_loc[d])
    dl = jnp.asarray(plan.dst_loc[d])
    ml = jnp.asarray(plan.mask_loc[d])
    el = jnp.asarray(et_loc[d])
    sr = jnp.asarray(plan.src_rem[d])
    dr = jnp.asarray(plan.dst_rem[d])
    mr = jnp.asarray(plan.mask_rem[d])
    er = jnp.asarray(et_rem[d])
    w = jnp.asarray(W)
    send = jnp.asarray(plan.send_idx[d])

    def seg_part(msgs, dst_i, mask, nd):
        neg = jnp.finfo(msgs.dtype).min
        msgs = jnp.where(mask[:, None], msgs, neg)
        return segment_max(msgs, dst_i, nd)

    @jax.jit
    def local_part(x_l, sl, dl, ml, el, w, send):
        send_buf = x_l[send]  # gather cost of building the send buffer
        h_l = (x_l @ w).reshape(-1, args.cout, args.etypes)
        msgs = jnp.einsum("ect,et->ec", h_l[sl], el)
        return seg_part(msgs, dl, ml, Nd), send_buf.sum()

    @jax.jit
    def remote_part(recv, sr, dr, mr, er, w):
        h_r = (recv @ w).reshape(-1, args.cout, args.etypes)
        msgs = jnp.einsum("ect,et->ec", h_r[sr], er)
        return seg_part(msgs, dr, mr, Nd)

    t_local = time_fn(local_part, x_l, sl, dl, ml, el, w, send)
    t_remote = time_fn(remote_part, recv, sr, dr, mr, er, w)
    return t_local, t_remote


def ldpc_flagship_graph(args, rng):
    """Disjoint union of ``--ldpc-batch`` 96.3.963 code graphs — the
    flagship f2v conv (96 var destinations x K=3 check sources, T=4) as
    one giant block-diagonal COO graph.  Codes are contiguous, so block
    partitioning keeps whole codes on one shard and the halo is tiny —
    the projection of the flagship's actual large-scale deployment shape
    (batch-as-giant-graph, SURVEY.md par.7.5)."""
    from fgnn_tpu.data.ldpc_graph import default_structure

    s = default_structure()
    vc = np.asarray(s.var_checks, np.int64)            # (96, 3) check ids
    B = args.ldpc_batch
    n_var, n_chk, K = 96, 48, vc.shape[1]
    src = (vc[None, :, :] + np.arange(B)[:, None, None] * n_chk).reshape(-1)
    dst = np.repeat(np.arange(B * n_var), K)
    args.nodes = B * n_chk
    args.dst_nodes = B * n_var
    args.edges = src.size
    et = rng.randn(args.edges, args.etypes).astype(np.float32)
    x = rng.randn(args.nodes, args.cin).astype(np.float32)
    W = (rng.randn(args.cin, args.cout * args.etypes) * 0.1).astype(
        np.float32)
    return x, src, dst, et, W


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=131072)
    p.add_argument("--dst-nodes", type=int, default=None)
    p.add_argument("--edges", type=int, default=2000000)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--cout", type=int, default=64)
    p.add_argument("--etypes", type=int, default=4)
    p.add_argument("--locality", type=int, default=4096)
    p.add_argument("--devices", type=str, default="2,4,8,16")
    p.add_argument("--ici-gbps", type=float, default=V5E_ICI_GBPS)
    p.add_argument("--preset", choices=["synthetic", "ldpc-flagship"],
                   default="synthetic")
    p.add_argument("--ldpc-batch", type=int, default=4096,
                   help="codes in the ldpc-flagship giant graph")
    p.add_argument("--out", default="benchmarks/ici_projection.json")
    args = p.parse_args()
    if args.dst_nodes is None:
        args.dst_nodes = args.nodes

    from fgnn_tpu.parallel import build_halo_plan
    from fgnn_tpu.ops.segment import CooGraph, typed_mp_conv_coo

    rng = np.random.RandomState(0)
    if args.preset == "ldpc-flagship":
        x, src, dst, et, W = ldpc_flagship_graph(args, rng)
    else:
        x, src, dst, et, W = make_graph(args, rng)

    # single-device baseline: the plain COO conv over the full graph
    @jax.jit
    def single(xa, sa, da, ea, wa):
        return typed_mp_conv_coo(xa, sa, da, ea, wa, args.cout,
                                 args.dst_nodes, aggregator="max")

    t1 = time_fn(single, jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                 jnp.asarray(et), jnp.asarray(W))

    rows = []
    for D in [int(s) for s in args.devices.split(",")]:
        plan = build_halo_plan(src, dst, args.nodes, args.dst_nodes, D)
        t_local, t_remote = shard_kernel_time(args, plan, x, et, W)
        payload = 2 * (D - 1) * plan.halo * args.cin * 4  # bytes, send+recv
        t_comm = payload / (args.ici_gbps * 1e9)
        t_opt = max(t_local, t_comm) + t_remote
        t_pes = t_local + t_remote + t_comm
        t_ideal = t_local + t_remote  # this shard's own compute
        rows.append({
            "devices": D,
            "halo_rows": int(plan.halo),
            "local_edges": int(plan.mask_loc.sum() // D),
            "remote_edges": int(plan.mask_rem.sum() // D),
            "comm_bytes_per_device": int(payload),
            "t_local_ms": round(t_local * 1e3, 3),
            "t_remote_ms": round(t_remote * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "t_step_overlap_ms": round(t_opt * 1e3, 3),
            "t_step_serial_ms": round(t_pes * 1e3, 3),
            # in (0, 1] by construction: share of the projected step spent
            # on this shard's own compute (1 - what comm/non-overlap cost)
            "efficiency_overlap": round(t_ideal / t_opt, 3),
            "efficiency_serial": round(t_ideal / t_pes, 3),
            # raw ratio vs the measured single-device step; may exceed D
            # (superlinear single-device segment costs), reported for
            # transparency, NOT an efficiency
            "speedup_vs_single": round(t1 / t_opt, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    blob = {
        "config": vars(args),
        "platform": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "single_device_ms": round(t1 * 1e3, 3),
        "ici_model": f"{args.ici_gbps} GB/s one-way single link "
                     "(conservative v5e; torus all_to_all has >1 link)",
        "caveats": [
            "per-shard local compute is the UNFUSED XLA COO path (the "
            "fused dense kernel does not cover ragged COO shards), so "
            "absolute shard times are conservative; efficiencies "
            "compare comm against that same path",
            "efficiency_* = (t_local+t_remote)/t_proj in (0,1] by "
            "construction; speedup_vs_single is the raw ratio against "
            "the measured single-device step and can exceed D because "
            "the single-device segment reduction is superlinear in "
            "segment count",
        ],
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
