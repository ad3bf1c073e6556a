"""Halo-exchange edge-partitioned aggregation: parity vs the single-device
COO kernel (fgnn_tpu.ops.typed_mp_conv_coo) on an 8-virtual-device mesh.

The replicated-source path (partitioned_typed_mp_coo) is already parity
tested in test_edge_partition.py; this file covers the sharded-source
halo mode for all four aggregators, uneven block sizes, gradients, and the
plan's exchange bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.ops import typed_mp_conv_coo
from fgnn_tpu.parallel import make_mesh
from fgnn_tpu.parallel.halo import build_halo_plan, halo_typed_mp_coo


def _random_graph(rng, n_src=50, n_dst=30, e=400, t=3, cin=8, cout=5):
    src = rng.randint(0, n_src, e).astype(np.int32)
    dst = rng.randint(0, n_dst, e).astype(np.int32)
    # every destination gets at least one edge (segment-identity handling is
    # covered separately below)
    dst[:n_dst] = np.arange(n_dst)
    et = rng.randn(e, t).astype(np.float32)
    x = rng.randn(n_src, cin).astype(np.float32)
    w = (0.1 * rng.randn(cin, cout * t)).astype(np.float32)
    return x, src, dst, et, w


def _run_halo(x, src, dst, et, w, cout, n_dst, n_dev, aggregator,
              bias=None):
    mesh = make_mesh((n_dev, 1), devices=jax.devices()[:n_dev])
    plan = build_halo_plan(src, dst, x.shape[0], n_dst, n_dev)
    et_loc, et_rem = plan.shard_edge_data(et)
    out = halo_typed_mp_coo(
        plan.pad_src(jnp.asarray(x)), jnp.asarray(et_loc),
        jnp.asarray(et_rem), jnp.asarray(w), cout, plan, mesh,
        aggregator=aggregator, bias=bias)
    return np.asarray(out)[:n_dst], plan


@pytest.mark.parametrize("aggregator", ["max", "softmax", "mean", "sum"])
@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_halo_parity(rng, aggregator, n_dev):
    cout = 5
    x, src, dst, et, w = _random_graph(rng)
    ref = np.asarray(typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        jnp.asarray(w), cout, 30, aggregator=aggregator))
    got, _ = _run_halo(x, src, dst, et, w, cout, 30, n_dev, aggregator)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_halo_bias_and_empty_segments(rng):
    # destinations 28, 29 have no edges: reference zeroes empty max segments
    cout = 4
    x, src, dst, et, w = _random_graph(rng, n_dst=30, e=200, cout=cout)
    dst = np.clip(dst, 0, 27).astype(np.int32)
    bias = rng.rand(cout).astype(np.float32)
    ref = np.asarray(typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
        jnp.asarray(w), cout, 30, aggregator="max", bias=jnp.asarray(bias)))
    got, _ = _run_halo(x, src, dst, et, w, cout, 30, 8, "max",
                       bias=jnp.asarray(bias))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_halo_gradients_match(rng):
    """d(loss)/dx and d(loss)/dW through the halo path == single-device."""
    cout = 5
    n_dst = 30
    x, src, dst, et, w = _random_graph(rng)
    n_dev = 8
    mesh = make_mesh((n_dev, 1), devices=jax.devices()[:n_dev])
    plan = build_halo_plan(src, dst, x.shape[0], n_dst, n_dev)
    et_loc, et_rem = plan.shard_edge_data(et)

    def loss_halo(x_, w_):
        out = halo_typed_mp_coo(
            plan.pad_src(x_), jnp.asarray(et_loc), jnp.asarray(et_rem),
            w_, cout, plan, mesh, aggregator="softmax")
        return jnp.sum(out[: n_dst] ** 2)

    def loss_ref(x_, w_):
        out = typed_mp_conv_coo(
            x_, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
            w_, cout, n_dst, aggregator="softmax")
        return jnp.sum(out ** 2)

    gx_h, gw_h = jax.grad(loss_halo, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_plan_comm_volume_beats_replication(rng):
    """The point of the halo: ship (D-1)*H boundary rows, not all N rows."""
    n_src, n_dst, e = 4096, 4096, 16384
    src = rng.randint(0, n_src, e).astype(np.int32)
    # mostly-local edges: destination near its source block
    dst = np.clip(src + rng.randint(-64, 64, e), 0, n_dst - 1).astype(np.int32)
    plan = build_halo_plan(src, dst, n_src, n_dst, 8)
    assert plan.comm_rows_per_device < n_src / 4, (
        plan.comm_rows_per_device, n_src)


def test_plan_jit_cache_stable(rng):
    """Same plan reused under jit: one compilation, stable results."""
    cout = 4
    x, src, dst, et, w = _random_graph(rng, cin=6, cout=cout)
    n_dev = 8
    mesh = make_mesh((n_dev, 1), devices=jax.devices()[:n_dev])
    plan = build_halo_plan(src, dst, x.shape[0], 30, n_dev)
    et_loc, et_rem = plan.shard_edge_data(et)

    @jax.jit
    def step(x_):
        return halo_typed_mp_coo(
            plan.pad_src(x_), jnp.asarray(et_loc), jnp.asarray(et_rem),
            jnp.asarray(w), cout, plan, mesh, aggregator="max")

    a = step(jnp.asarray(x))
    b = step(jnp.asarray(x * 2.0))
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))
