#!/usr/bin/env python
"""Bisect the B=256 LDPC train step: forward / fwd+bwd / full step / parts.

Prints one JSON line per variant with ms and HLO op counts, to locate
where the 12.6ms (vs 1.15ms compute floor) actually goes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _readback(x):
    import jax

    return float(jax.tree.leaves(x)[0].ravel()[0])


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    _readback(out)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _readback(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best


def hlo_ops(compiled):
    try:
        mods = compiled.runtime_executable().hlo_modules()
        return sum(m.to_string().count("\n    ") for m in mods)
    except Exception:
        return -1


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.models import LDPCModel
    from fgnn_tpu.train.ldpc import _model_inputs, create_state, make_train_step
    from fgnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(os.environ.get("FGNN_BENCH_BATCH", "256"))
    ds = ContinuousCodesSP(length=B, seed=0)
    batch = jax.device_put(next(ds.batches(B)))
    model = LDPCModel()
    state, tx = create_state(model, batch)
    inputs = _model_inputs(batch)
    label = batch["label"][:, :48].astype(jnp.float32)
    st = jnp.power(10.0, batch["sigma_b"].astype(jnp.float32) / 20.0)

    def run(name, fn, *args):
        try:
            dt = time_fn(fn, *args)
            try:
                ops = hlo_ops(fn.lower(*args).compile())
            except Exception:
                ops = -1
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "hlo_ops": ops}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": repr(e)[:200]}), flush=True)

    # 1. forward only (train mode, batch stats mutable)
    @jax.jit
    def fwd(params, bstats):
        (logits, sb), upd = model.apply(
            {"params": params, "batch_stats": bstats}, **inputs,
            train=True, mutable=["batch_stats"])
        return logits.sum() + sb.sum()

    run("forward_train", fwd, state.params, state.batch_stats)

    # 1b. forward eval mode (no batch-stat reductions)
    @jax.jit
    def fwd_eval(params, bstats):
        logits, sb = model.apply(
            {"params": params, "batch_stats": bstats}, **inputs, train=False)
        return logits.sum() + sb.sum()

    run("forward_eval", fwd_eval, state.params, state.batch_stats)

    # 2. forward+backward (grads only, no optimizer)
    def loss_fn(params, bstats):
        (logits, sb), upd = model.apply(
            {"params": params, "batch_stats": bstats}, **inputs,
            train=True, mutable=["batch_stats"])
        bce = optax.sigmoid_binary_cross_entropy(
            logits.reshape(-1), label.reshape(-1)).mean()
        return bce + 0.1 * jnp.mean(jnp.square(sb.reshape(-1) - st))

    @jax.jit
    def fwdbwd(params, bstats):
        return jax.grad(loss_fn)(params, bstats)

    run("forward_backward", fwdbwd, state.params, state.batch_stats)

    # 3. full train step
    train_step = make_train_step(model, tx)
    holder = {"s": state}

    def full():
        holder["s"], m = train_step(holder["s"], batch)
        return m["loss"]

    try:
        dt = time_fn(full)
        print(json.dumps({"variant": "full_step", "ms": round(dt * 1e3, 3),
                          "hlo_ops": -1}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": "full_step",
                          "error": repr(e)[:200]}), flush=True)

    # 4. optimizer alone (update+apply on existing grads).  The original
    # `state` was DONATED into the timed train steps above, so use the
    # live carried state (reading donated buffers raises).
    live = holder["s"]
    grads = fwdbwd(live.params, live.batch_stats)

    @jax.jit
    def opt_only(g, opt_state, params):
        updates, new_opt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates)

    run("adam_only", opt_only, grads, live.opt_state, live.params)


if __name__ == "__main__":
    main()
