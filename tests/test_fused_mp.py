"""Parity tests for the fully-fused Pallas typed-mp kernel (ops/fused_mp.py).

Runs in Pallas interpret mode on CPU (conftest pins JAX_PLATFORMS=cpu), with
``precision='float32'`` so values match the XLA reference path bit-closely.
The TPU-compiled kernel is exercised by benchmarks/bisect_step.py and the
trainers on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.ops.fused_mp import fused_supported, fused_typed_mp
from fgnn_tpu.ops.typed_mp import Extension, typed_mp_conv

AGGS = ["max", "sum", "mean", "softmax"]

# (B, N_src, Cin, Nd, K, T, C) — LDPC f2v/v2f shapes plus odd sizes
SHAPES = [
    (6, 48, 16, 96, 3, 4, 32),   # LDPC f2v-like (checks -> vars)
    (4, 96, 16, 48, 6, 4, 24),   # LDPC v2f-like (vars -> checks)
    (2, 8, 8, 16, 2, 1, 8),      # tiny, T=1
    (3, 136, 8, 8, 5, 3, 8),     # N_src > 128 (two lane tiles)
]


def _mk(rng, B, N, Cin, Nd, K, T, C):
    x = jnp.asarray(rng.randn(B, N, Cin), jnp.float32)
    nn = jnp.asarray(rng.randint(0, N, (Nd, K)), jnp.int32)
    et = jnp.asarray(rng.randn(B, Nd, K, T), jnp.float32)
    w = jnp.asarray(rng.randn(Cin, C * T) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, nn, et, w, b


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("agg", AGGS)
def test_forward_matches_xla(rng, shape, agg):
    B, N, Cin, Nd, K, T, C = shape
    x, nn, et, w, b = _mk(rng, *shape)
    ref = typed_mp_conv(x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                        aggregator=agg, bias=b)
    got = fused_typed_mp(x, nn, et, w, C, aggregator=agg, bias=b,
                         precision="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES[:2])
@pytest.mark.parametrize("agg", AGGS)
def test_grads_match_xla(rng, shape, agg):
    B, N, Cin, Nd, K, T, C = shape
    x, nn, et, w, b = _mk(rng, *shape)

    def loss_ref(x, et, w, b):
        o = typed_mp_conv(x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                          aggregator=agg, bias=b)
        return jnp.sum(jnp.sin(o))

    def loss_fused(x, et, w, b):
        o = fused_typed_mp(x, nn, et, w, C, aggregator=agg, bias=b,
                           precision="float32")
        return jnp.sum(jnp.sin(o))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, et, w, b)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, et, w, b)
    for name, a, c in zip(["dx", "detype", "dfilters", "dbias"], gr, gf):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-5,
            err_msg=f"{name} mismatch ({agg}, {shape})")


def test_supported_predicate():
    # LDPC type-0 convs are covered
    assert fused_supported((256, 48, 64), (96, 3), (256, 96, 3, 4), "max")
    assert fused_supported((256, 96, 64), (48, 6), (256, 48, 6, 4), "max")
    # type-1 global-factor v2f (K=96) is not
    assert not fused_supported((256, 96, 64), (1, 96), (256, 1, 96, 1), "max")
    # batched (per-sample) tables are not
    assert not fused_supported((4, 8, 8), (3, 8, 2), (4, 8, 2, 1), "max")
    # extensions are not (yet)
    assert not fused_supported((4, 8, 8), (8, 2), (4, 8, 2, 1), "max",
                               extension_name="diff")


def test_jit_and_vmapless_batch_tiles(rng):
    # B not divisible by 8/4/2 exercises the BT=1 path under jit
    B, N, Cin, Nd, K, T, C = 5, 16, 8, 8, 3, 2, 16
    x, nn, et, w, _ = _mk(rng, B, N, Cin, Nd, K, T, C)
    ref = typed_mp_conv(x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                        aggregator="max")
    got = jax.jit(lambda x, et, w: fused_typed_mp(
        x, nn, et, w, C, aggregator="max", precision="float32"))(x, et, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ext", ["diff", "neighbor"])
@pytest.mark.parametrize("agg", ["max", "softmax"])
def test_extension_forward_and_grads(rng, ext, agg):
    """DIFF/NEIGHBOR extensions via the stacked [dst|src] one-hot: parity
    incl. gradients vs the XLA extension path (joint-graph shapes)."""
    B, N, Cin, K, T, C = 4, 24, 8, 3, 6, 16
    Nd = N  # extensions index x by destination: joint graphs
    x = jnp.asarray(rng.randn(B, N, Cin), jnp.float32)
    nn = jnp.asarray(rng.randint(0, N, (Nd, K)), jnp.int32)
    et = jnp.asarray(rng.randn(B, Nd, K, T), jnp.float32)
    w = jnp.asarray(rng.randn(2 * Cin, C * T) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    extension = (Extension.ORIG_WITH_DIFF if ext == "diff"
                 else Extension.ORIG_WITH_NEIGHBOR)

    ref = typed_mp_conv(x, nn, et, w, C, extension=extension,
                        aggregator=agg, bias=b)
    got = fused_typed_mp(x, nn, et, w, C, extension=ext, aggregator=agg,
                         bias=b, precision="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(f):
        return lambda x, et, w: jnp.sum(jnp.sin(f(x, et, w)))

    gr = jax.grad(loss(lambda x, et, w: typed_mp_conv(
        x, nn, et, w, C, extension=extension, aggregator=agg)),
        argnums=(0, 1, 2))(x, et, w)
    gf = jax.grad(loss(lambda x, et, w: fused_typed_mp(
        x, nn, et, w, C, extension=ext, aggregator=agg,
        precision="float32")), argnums=(0, 1, 2))(x, et, w)
    for name, a, c in zip(["dx", "detype", "dfilters"], gr, gf):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-5, atol=5e-5,
            err_msg=f"{name} mismatch ({ext}, {agg})")


def test_large_T_recompute_backward(rng):
    """A large T*E softmax conv drives the NO-STORE backward variant (each
    hg_t recomputed in the gradient loop instead of kept in VMEM); parity
    incl. grads.  Softmax is the aggregator whose backward consumes the
    recomputed messages (max/sum/mean never store hg at all)."""
    from fgnn_tpu.ops.fused_mp import _batch_tile, _store_hg

    B, N, Cin, Nd, K, T, C = 8, 64, 8, 72, 4, 16, 64
    bt = _batch_tile(B, C, T, Nd * K, N, Nd)
    assert bt == 8, bt  # the tile the dispatcher picks for these sizes
    assert _store_hg(bt, C, T, Nd * K) is False  # no-store branch engaged
    x = jnp.asarray(rng.randn(B, N, Cin), jnp.float32)
    nn = jnp.asarray(rng.randint(0, N, (Nd, K)), jnp.int32)
    et = jnp.asarray(rng.randn(B, Nd, K, T), jnp.float32)
    w = jnp.asarray(rng.randn(Cin, C * T) * 0.1, jnp.float32)

    ref = typed_mp_conv(x, nn, et, w, C, extension=Extension.NO_EXTENSION,
                        aggregator="softmax")
    got = fused_typed_mp(x, nn, et, w, C, aggregator="softmax",
                         precision="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(lambda et: jnp.sum(jnp.sin(typed_mp_conv(
        x, nn, et, w, C, extension=Extension.NO_EXTENSION,
        aggregator="softmax"))))(et)
    gf = jax.grad(lambda et: jnp.sum(jnp.sin(fused_typed_mp(
        x, nn, et, w, C, aggregator="softmax", precision="float32"))))(et)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=5e-5, atol=5e-5)


def test_max_tie_gradient_semantics(rng):
    """On EXACT ties in max aggregation the fused backward routes the whole
    cotangent to the first-winning slot (k-order first-win argmax), while
    the XLA path (jnp.max VJP) splits it evenly among tied slots.  Both are
    valid subgradients; this test documents the divergence (measure-zero
    with continuous features) so cross-path parity debugging isn't
    confusing.  See ops/fused_mp.py `_fwd_kernel`."""
    B, N, Cin, Nd, K, T, C = 8, 16, 4, 16, 3, 2, 16
    x = jnp.asarray(np.ones((B, N, Cin)), jnp.float32)
    # identical source rows + identical etype -> every k slot ties exactly
    nn = jnp.asarray(np.zeros((Nd, K)), jnp.int32)
    et = jnp.asarray(np.ones((B, Nd, K, T)), jnp.float32)
    w = jnp.asarray(rng.randn(Cin, C * T) * 0.1, jnp.float32)

    g_fused = jax.grad(lambda et: jnp.sum(fused_typed_mp(
        x, nn, et, w, C, aggregator="max", precision="float32")))(et)
    g_xla = jax.grad(lambda et: jnp.sum(typed_mp_conv(
        x, nn, et, w, C, extension=Extension.NO_EXTENSION,
        aggregator="max")))(et)
    gf, gx = np.asarray(g_fused), np.asarray(g_xla)
    # fused: all mass on k=0; XLA: split across the K tied slots
    assert np.allclose(gf[:, :, 1:], 0.0)
    np.testing.assert_allclose(gf[:, :, 0], gx.sum(axis=2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(gx[:, :, 0], gx[:, :, 1], rtol=1e-5,
                               atol=1e-6)
