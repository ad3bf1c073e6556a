"""Edge-partitioned aggregation vs the single-device COO path, on the
8-device virtual mesh (includes the cross-shard logsumexp numerics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgnn_tpu.ops import typed_mp_conv_coo
from fgnn_tpu.parallel import make_mesh, pad_edges, partitioned_typed_mp_coo


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8, 1), devices=jax.devices()[:8])


@pytest.mark.parametrize("aggregator", ["max", "sum", "mean", "softmax"])
def test_partitioned_matches_single_device(mesh, aggregator, rng):
    Ns, Nd, E, Cin, Cout, T = 20, 9, 53, 6, 5, 3  # E deliberately not /8
    x = rng.randn(Ns, Cin).astype(np.float32)
    src = rng.randint(0, Ns, E).astype(np.int32)
    dst = rng.randint(0, Nd, E).astype(np.int32)
    etype = rng.randn(E, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)

    ref = typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(etype), jnp.asarray(W), Cout, Nd, aggregator=aggregator)

    srcp, dstp, etp, mask = pad_edges(src, dst, etype, 8)
    got = partitioned_typed_mp_coo(
        jnp.asarray(x), jnp.asarray(srcp), jnp.asarray(dstp),
        jnp.asarray(etp), jnp.asarray(mask), jnp.asarray(W), Cout, Nd,
        mesh, aggregator=aggregator)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("aggregator", ["max", "sum", "mean", "softmax"])
def test_masked_single_device_matches_unpadded(aggregator, rng):
    """The single-device COO path WITH a padding mask equals the unpadded
    run — pins ops/segment.py's masked semantics (notably the masked-mean
    denominator counting only valid edges) to edge_partition/halo's."""
    Ns, Nd, E, Cin, Cout, T = 20, 9, 53, 6, 5, 3
    x = rng.randn(Ns, Cin).astype(np.float32)
    src = rng.randint(0, Ns, E).astype(np.int32)
    dst = rng.randint(0, Nd, E).astype(np.int32)
    etype = rng.randn(E, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)

    ref = typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(etype), jnp.asarray(W), Cout, Nd, aggregator=aggregator)

    srcp, dstp, etp, mask = pad_edges(src, dst, etype, 8)
    got = typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(srcp), jnp.asarray(dstp),
        jnp.asarray(etp), jnp.asarray(W), Cout, Nd, aggregator=aggregator,
        edge_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_empty_segments(mesh, rng):
    """Destinations with no edges must aggregate to 0 under max."""
    Ns, Nd, E, Cin, Cout, T = 10, 8, 16, 4, 3, 2
    x = rng.randn(Ns, Cin).astype(np.float32)
    src = rng.randint(0, Ns, E).astype(np.int32)
    dst = np.full(E, 2, np.int32)  # all edges hit segment 2
    etype = rng.randn(E, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)
    srcp, dstp, etp, mask = pad_edges(src, dst, etype, 8)
    out = partitioned_typed_mp_coo(
        jnp.asarray(x), jnp.asarray(srcp), jnp.asarray(dstp),
        jnp.asarray(etp), jnp.asarray(mask), jnp.asarray(W), Cout, Nd,
        mesh, aggregator="max")
    out = np.asarray(out)
    assert np.all(out[[0, 1, 3, 4, 5, 6, 7]] == 0.0)
    assert np.any(out[2] != 0.0)
