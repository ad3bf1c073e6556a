"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fgnn_tpu.parallel import make_mesh, shard_batch, shard_params


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


def test_mesh_shapes(devices):
    mesh = make_mesh((4, 2), devices=devices)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(devices=devices)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_shard_batch_places_batch_axis(devices):
    mesh = make_mesh((8, 1), devices=devices)
    batch = {
        "x": np.zeros((16, 96, 2), np.float32),
        "table": np.zeros((96, 3), np.int32),  # shared, not batched
    }
    sb = shard_batch(batch, mesh, batch_size=16)
    assert sb["x"].sharding.spec == P("data", None, None)
    assert sb["table"].sharding.spec == P()


def test_shard_params_tp(devices):
    mesh = make_mesh((4, 2), devices=devices)
    params = {
        "filters": np.zeros((64, 1024), np.float32),   # wide -> sharded
        "bias": np.zeros((64,), np.float32),           # replicated
    }
    sp = shard_params(params, mesh)
    assert sp["filters"].sharding.spec == P(None, "model")
    assert sp["bias"].sharding.spec == P()


def test_dp_train_step_syncbn_semantics(devices):
    """A jitted BatchNorm over a data-sharded batch must compute GLOBAL
    statistics (true SyncBatchNorm), identical to the unsharded result."""
    from fgnn_tpu.models import BatchNorm

    mesh = make_mesh((8, 1), devices=devices)
    rng = np.random.RandomState(0)
    x = rng.randn(16, 10, 4).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)

    @jax.jit
    def apply(v, xx):
        return bn.apply(v, xx, use_running_average=False,
                        mutable=["batch_stats"])

    out_ref, upd_ref = apply(variables, jnp.asarray(x))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    out_sh, upd_sh = apply(variables, xs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd_sh["batch_stats"]["var"]),
        np.asarray(upd_ref["batch_stats"]["var"]), rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_entry():
    """The driver's multichip dry run must compile and execute."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    ge.dryrun_multichip(n)
