"""HaloGraph as a consumed model mode: MPConv dispatching on a HaloGraph
must equal MPConv on the equivalent single-device CooGraph (8-virtual-device
mesh), in eval and train mode, including gradients through the layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.models.mp_conv import MPConv
from fgnn_tpu.ops import Extension
from fgnn_tpu.ops.segment import CooGraph
from fgnn_tpu.parallel import HaloGraph, build_halo_plan, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8, 1), devices=jax.devices()[:8])


def _chain_graph(rng, n=256, k=3, t=4, cin=8):
    """Locality-heavy graph with shard-divisible node counts (so the halo
    output has no padding rows and BatchNorm stats match exactly)."""
    src = np.repeat(np.arange(n), k).astype(np.int32)
    dst = np.clip(src + rng.randint(-4, 5, n * k), 0, n - 1).astype(np.int32)
    et = rng.randn(n * k, t).astype(np.float32)
    x = rng.randn(n, cin).astype(np.float32)
    return x, src, dst, et


@pytest.mark.parametrize("aggregator", ["max", "softmax"])
@pytest.mark.parametrize("train", [False, True])
def test_mpconv_halo_matches_coo(mesh, rng, aggregator, train):
    x, src, dst, et = _chain_graph(rng)
    n = x.shape[0]
    nout = 16

    coo = CooGraph(src=jnp.asarray(src), dst=jnp.asarray(dst), num_nodes=n)
    plan = build_halo_plan(src, dst, n, n, 8)
    halo = HaloGraph(plan=plan, mesh=mesh)

    conv = MPConv(nout=nout, nedge_types=4, aggregator=aggregator,
                  extension=Extension.NO_EXTENSION)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), coo,
                          jnp.asarray(et), train=False)

    kw = dict(train=train)
    if train:
        kw["mutable"] = ["batch_stats"]
        ref, ref_stats = conv.apply(variables, jnp.asarray(x), coo,
                                    jnp.asarray(et), **kw)
        got, got_stats = conv.apply(variables, jnp.asarray(x), halo,
                                    jnp.asarray(et), **kw)
        for a, b in zip(jax.tree.leaves(ref_stats), jax.tree.leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)
    else:
        ref = conv.apply(variables, jnp.asarray(x), coo, jnp.asarray(et), **kw)
        got = conv.apply(variables, jnp.asarray(x), halo, jnp.asarray(et), **kw)
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_mpconv_halo_gradients(mesh, rng):
    """Training works through the halo layer: grads wrt params and x match
    the single-device COO layer."""
    x, src, dst, et = _chain_graph(rng, n=128)
    n = x.shape[0]
    coo = CooGraph(src=jnp.asarray(src), dst=jnp.asarray(dst), num_nodes=n)
    plan = build_halo_plan(src, dst, n, n, 8)
    halo = HaloGraph(plan=plan, mesh=mesh)

    conv = MPConv(nout=8, nedge_types=4, aggregator="max",
                  extension=Extension.NO_EXTENSION, use_bn=False)
    variables = conv.init(jax.random.PRNGKey(1), jnp.asarray(x), coo,
                          jnp.asarray(et), train=False)

    def loss(params, g, xx):
        out = conv.apply({"params": params}, xx, g, jnp.asarray(et),
                         train=False)
        return jnp.sum(out[:n] ** 2)

    g_ref = jax.grad(loss)(variables["params"], coo, jnp.asarray(x))
    g_halo = jax.grad(loss)(variables["params"], halo, jnp.asarray(x))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_halo_graph_is_static_under_jit(mesh, rng):
    """A jitted function closing over a HaloGraph traces and runs."""
    x, src, dst, et = _chain_graph(rng, n=64)
    plan = build_halo_plan(src, dst, 64, 64, 8)
    halo = HaloGraph(plan=plan, mesh=mesh)
    conv = MPConv(nout=8, nedge_types=4, aggregator="max",
                  extension=Extension.NO_EXTENSION, use_bn=False)
    variables = conv.init(jax.random.PRNGKey(2), jnp.asarray(x),
                          CooGraph(src=jnp.asarray(src), dst=jnp.asarray(dst),
                                   num_nodes=64),
                          jnp.asarray(et), train=False)

    @jax.jit
    def fwd(v, xx, e):
        return conv.apply(v, xx, halo, e, train=False)

    out = fwd(variables, jnp.asarray(x), jnp.asarray(et))
    assert np.isfinite(np.asarray(out)).all()
