#!/usr/bin/env python
"""Edge-partitioned aggregation scaling harness.

Measures edges/s of the COO typed message-passing aggregation as the edge
list is partitioned over 1..N devices (ICI collectives combine partials),
reporting scaling efficiency vs the single-device run — the BASELINE.md
">= 80% efficiency 1 chip -> 2 hosts" check.

On a CPU host run it validates the harness on virtual devices:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --nodes 20000 --edges 2000000
On a real TPU slice the same command measures hardware scaling.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=20000)
    p.add_argument("--dst-nodes", type=int, default=10000)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--cout", type=int, default=64)
    p.add_argument("--etypes", type=int, default=4)
    p.add_argument("--aggregator", default="max")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from fgnn_tpu.parallel import make_mesh, pad_edges, partitioned_typed_mp_coo

    rng = np.random.RandomState(0)
    x = rng.randn(args.nodes, args.cin).astype(np.float32)
    src = rng.randint(0, args.nodes, args.edges).astype(np.int32)
    dst = rng.randint(0, args.dst_nodes, args.edges).astype(np.int32)
    et = rng.randn(args.edges, args.etypes).astype(np.float32)
    W = rng.randn(args.cin, args.cout * args.etypes).astype(np.float32)

    devices = jax.devices()
    results = {}
    n_opts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in n_opts:
        mesh = make_mesh((n, 1), devices=devices[:n])
        srcp, dstp, etp, mask = pad_edges(src, dst, et, n)

        def run():
            return partitioned_typed_mp_coo(
                jnp.asarray(x), jnp.asarray(srcp), jnp.asarray(dstp),
                jnp.asarray(etp), jnp.asarray(mask), jnp.asarray(W),
                args.cout, args.dst_nodes, mesh, aggregator=args.aggregator)

        out = run().block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        eps = args.edges / dt
        results[n] = eps
        eff = eps / (results[1] * n) if n > 1 else 1.0
        print(f"devices={n:3d}  {dt * 1e3:8.2f} ms  {eps / 1e6:9.1f} M edges/s"
              f"  efficiency={eff:6.1%}", flush=True)


if __name__ == "__main__":
    main()
