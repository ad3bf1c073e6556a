#!/usr/bin/env python
"""Micro-benchmark: fused Pallas typed-mp conv vs the XLA lowering.

One JSON line per (shape, aggregator, direction): fwd and fwd+bwd ms for
both paths at the LDPC flagship conv shapes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _readback(x):
    """Force a real host round-trip (block_until_ready is unreliable
    through the axon relay — see bench.py methodology note)."""
    import jax

    return float(jax.tree.leaves(x)[0].ravel()[0])


def time_fn(fn, *args, iters=50):
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
    return best * 1e3


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.ops.fused_mp import fused_typed_mp
    from fgnn_tpu.ops.typed_mp import Extension, typed_mp_conv
    from fgnn_tpu.utils import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write a JSON artifact")
    cli = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    B = int(os.environ.get("FGNN_BENCH_BATCH", "256"))
    records = []

    # LDPC flagship conv shapes: (name, N_src, Cin, Nd, K, T, C)
    shapes = [
        ("f2v64", 48, 64, 96, 3, 4, 64),
        ("v2f64", 96, 64, 48, 6, 4, 64),
        ("f2v128", 48, 64, 96, 3, 4, 128),
        ("v2f128", 96, 64, 48, 6, 4, 128),
    ]
    for name, N, Cin, Nd, K, T, C in shapes:
        x = jnp.asarray(rng.randn(B, N, Cin), jnp.float32)
        nn = jnp.asarray(rng.randint(0, N, (Nd, K)), jnp.int32)
        et = jnp.asarray(rng.randn(B, Nd, K, T), jnp.float32)
        w = jnp.asarray(rng.randn(Cin, C * T) * 0.1, jnp.float32)

        for agg in ("max",):
            # typed_mp_conv dispatches to the fused kernel by default on
            # TPU; pin the env per-trace so both paths are measured.
            os.environ["FGNN_FUSED"] = "0"
            xla_f = jax.jit(lambda x, et, w: typed_mp_conv(
                x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                aggregator=agg))
            fus_f = jax.jit(lambda x, et, w: fused_typed_mp(
                x, nn, et, w, C, aggregator=agg))

            def loss(f):
                return jax.jit(jax.grad(
                    lambda x, et, w: jnp.sum(jnp.sin(f(x, et, w))),
                    argnums=(0, 1, 2)))

            xla_b = loss(lambda x, et, w: typed_mp_conv(
                x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                aggregator=agg))
            fus_b = loss(lambda x, et, w: fused_typed_mp(
                x, nn, et, w, C, aggregator=agg))

            rec = {"shape": name, "agg": agg, "B": B,
                   "xla_fwd_ms": round(time_fn(xla_f, x, et, w), 4),
                   "fused_fwd_ms": round(time_fn(fus_f, x, et, w), 4),
                   "xla_fwdbwd_ms": round(time_fn(xla_b, x, et, w), 4),
                   "fused_fwdbwd_ms": round(time_fn(fus_b, x, et, w), 4)}
            rec["fwd_speedup"] = round(rec["xla_fwd_ms"] / rec["fused_fwd_ms"], 2)
            rec["fwdbwd_speedup"] = round(
                rec["xla_fwdbwd_ms"] / rec["fused_fwdbwd_ms"], 2)
            print(json.dumps(rec), flush=True)
            records.append(rec)

    if cli.out:
        with open(cli.out, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "rows": records}, f, indent=1)
        print(f"wrote {cli.out}")


if __name__ == "__main__":
    main()
