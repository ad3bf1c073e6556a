#!/usr/bin/env python
"""Edge-partitioned aggregation scaling harness.

Measures edges/s of the COO typed message-passing aggregation as the edge
list is partitioned over 1..N devices, reporting scaling efficiency vs the
single-device run — the BASELINE.md ">= 80% efficiency 1 chip -> 2 hosts"
check.  Two partitioned modes:

  * ``replicated`` — source features replicated on every device, partial
    segment reductions combined with psum/pmax (the small-graph fast path,
    fgnn_tpu.parallel.partitioned_typed_mp_coo);
  * ``halo``       — source features row-sharded, boundary rows exchanged
    with one all_to_all overlapped with the local aggregation
    (fgnn_tpu.parallel.halo, the large-graph mode).

``--locality W`` draws each edge's destination within a window W of its
source, modelling a partitioned factor graph (disjoint-union batches are
block-diagonal, so real halos are narrow); ``--locality 0`` is fully
random (worst case: every row is boundary).

On a CPU host run it validates the harness on virtual devices:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --nodes 131072 --edges 2000000 --mode both
On a real TPU slice the same command measures hardware scaling.
Writes a JSON result table with --out.
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
from jax.sharding import NamedSharding, PartitionSpec as P


def time_step(run, iters):
    out = run()
    jax.tree.map(lambda a: a.block_until_ready(), out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def bench_replicated(args, x, src, dst, et, W, mesh, n):
    from fgnn_tpu.parallel import pad_edges, partitioned_typed_mp_coo
    srcp, dstp, etp, mask = pad_edges(src, dst, et, n)
    xj, srcj, dstj, etj, maskj, Wj = map(
        jnp.asarray, (x, srcp, dstp, etp, mask, W))

    # NOTE: inputs must be ARGUMENTS of the jitted fn — closed-over arrays
    # become jaxpr constants and XLA constant-folds the whole step.
    @jax.jit
    def step(xa, sa, da, ea, ma, wa):
        return partitioned_typed_mp_coo(
            xa, sa, da, ea, ma, wa,
            args.cout, args.dst_nodes, mesh, aggregator=args.aggregator)

    return time_step(
        lambda: step(xj, srcj, dstj, etj, maskj, Wj), args.iters)


def bench_halo(args, x, src, dst, et, W, mesh, n):
    from fgnn_tpu.parallel import build_halo_plan, halo_typed_mp_coo
    plan = build_halo_plan(src, dst, args.nodes, args.dst_nodes, n)
    et_loc, et_rem = plan.shard_edge_data(et)
    xp = np.zeros((n * plan.src_block, args.cin), np.float32)
    xp[: args.nodes] = x
    shard = NamedSharding(mesh, P("data"))
    xj = jax.device_put(jnp.asarray(xp), shard)
    etl = jax.device_put(jnp.asarray(et_loc), shard)
    etr = jax.device_put(jnp.asarray(et_rem), shard)
    Wj = jnp.asarray(W)

    @jax.jit
    def step(xa, ela, era, wa):
        return halo_typed_mp_coo(
            xa, ela, era, wa, args.cout, plan, mesh,
            aggregator=args.aggregator)

    dt = time_step(lambda: step(xj, etl, etr, Wj), args.iters)
    return dt, plan


def bench_model(args, x, src, dst, et_feature, mesh, n):
    """The CONSUMED halo mode: MPConv (the flax layer) dispatching on a
    HaloGraph — emodel etype -> shard_etype -> halo_typed_mp_coo -> bias,
    exactly the path a large-graph model runs."""
    import jax.numpy as jnp

    from fgnn_tpu.models.mp_conv import MPConv
    from fgnn_tpu.ops import Extension
    from fgnn_tpu.ops.segment import CooGraph
    from fgnn_tpu.parallel import HaloGraph, build_halo_plan

    conv = MPConv(nout=args.cout, nedge_types=args.etypes, aggregator="max",
                  extension=Extension.NO_EXTENSION, use_bn=False)
    xj = jnp.asarray(x)
    etj = jnp.asarray(et_feature)
    if n == 1:
        g = CooGraph(src=jnp.asarray(src), dst=jnp.asarray(dst),
                     num_nodes=args.dst_nodes)
        plan = None
    else:
        plan = build_halo_plan(src, dst, args.nodes, args.dst_nodes, n)
        g = HaloGraph(plan=plan, mesh=mesh)
    variables = jax.jit(lambda xx, ee: conv.init(
        jax.random.PRNGKey(0), xx, g, ee, train=False))(xj, etj)

    @jax.jit
    def step(v, xx, ee):
        return conv.apply(v, xx, g, ee, train=False)

    return time_step(lambda: step(variables, xj, etj), args.iters), plan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=131072)
    p.add_argument("--dst-nodes", type=int, default=131072)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--cout", type=int, default=64)
    p.add_argument("--etypes", type=int, default=4)
    p.add_argument("--aggregator", default="max")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mode", choices=["replicated", "halo", "model", "both"],
                   default="both")
    p.add_argument("--locality", type=int, default=4096,
                   help="edge dst window around src (0 = fully random)")
    p.add_argument("--out", default=None, help="write JSON results here")
    args = p.parse_args()

    from fgnn_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    x = rng.randn(args.nodes, args.cin).astype(np.float32)
    src = rng.randint(0, args.nodes, args.edges).astype(np.int32)
    if args.locality:
        dst = np.clip(
            src.astype(np.int64) * args.dst_nodes // args.nodes
            + rng.randint(-args.locality, args.locality + 1, args.edges),
            0, args.dst_nodes - 1).astype(np.int32)
    else:
        dst = rng.randint(0, args.dst_nodes, args.edges).astype(np.int32)
    et = rng.randn(args.edges, args.etypes).astype(np.float32)
    W = (0.05 * rng.randn(args.cin, args.cout * args.etypes)).astype(
        np.float32)

    devices = jax.devices()
    modes = (["replicated", "halo"] if args.mode == "both" else [args.mode])
    results = {m: {} for m in modes}
    rows = []
    n_opts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for mode in modes:
        for n in n_opts:
            mesh = make_mesh((n, 1), devices=devices[:n])
            halo_rows = None
            if mode == "replicated":
                dt = bench_replicated(args, x, src, dst, et, W, mesh, n)
                # ring all-reduce of the (dst, cout) partials per aggregator
                comm_bytes = (2 * (n - 1) / n) * args.dst_nodes * args.cout * 4
            elif mode == "model":
                dt, plan = bench_model(args, x, src, dst, et, mesh, n)
                halo_rows = plan.comm_rows_per_device if plan else 0
                comm_bytes = halo_rows * args.cin * 4
            else:
                dt, plan = bench_halo(args, x, src, dst, et, W, mesh, n)
                halo_rows = plan.comm_rows_per_device
                comm_bytes = halo_rows * args.cin * 4
            eps = args.edges / dt
            results[mode][n] = eps
            eff = eps / (results[mode][1] * n) if n > 1 else 1.0
            row = dict(mode=mode, devices=n, ms=dt * 1e3, edges_per_s=eps,
                       efficiency=eff, halo_rows_per_device=halo_rows,
                       comm_bytes_per_device=comm_bytes)
            rows.append(row)
            extra = (f"  halo_rows/dev={halo_rows}"
                     if halo_rows is not None else "")
            print(f"{mode:10s} devices={n:3d}  {dt * 1e3:8.2f} ms"
                  f"  {eps / 1e6:9.1f} M edges/s  efficiency={eff:6.1%}"
                  f"{extra}", flush=True)

    if args.out:
        payload = dict(
            config={k: v for k, v in vars(args).items() if k != "out"},
            platform=jax.devices()[0].platform,
            n_devices=len(devices), rows=rows)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
