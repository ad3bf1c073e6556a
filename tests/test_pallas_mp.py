"""Fused Pallas kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from fgnn_tpu.ops import Extension, typed_mp_conv
from fgnn_tpu.ops.pallas_mp import fused_gather_mix_aggregate


def _setup(rng, B=3, Ns=12, Nd=8, K=3, C=16, T=4):
    h = rng.randn(B, Ns, C * T).astype(np.float32)
    nn_idx = rng.randint(0, Ns, (Nd, K)).astype(np.int32)
    etype = rng.randn(B, Nd, K, T).astype(np.float32)
    return jnp.asarray(h), jnp.asarray(nn_idx), jnp.asarray(etype)


def _xla_ref(h, nn_idx, etype, C, T, aggregator):
    hg = h[:, nn_idx].reshape(h.shape[0], *nn_idx.shape, C, T)
    msgs = jnp.einsum("bnkct,bnkt->bnkc", hg, etype)
    if aggregator == "max":
        return msgs.max(axis=2)
    if aggregator == "mean":
        return msgs.mean(axis=2)
    return msgs.sum(axis=2)


@pytest.mark.parametrize("aggregator", ["max", "mean", "sum"])
def test_fused_forward_matches_xla(rng, aggregator):
    C, T = 16, 4
    h, nn_idx, etype = _setup(rng, C=C, T=T)
    with pltpu.force_tpu_interpret_mode():
        got = fused_gather_mix_aggregate(h, nn_idx, etype, C, T, aggregator)
    want = _xla_ref(h, nn_idx, etype, C, T, aggregator)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("aggregator", ["max", "mean"])
def test_fused_vjp_matches_xla(rng, aggregator):
    C, T = 8, 2
    h, nn_idx, etype = _setup(rng, B=2, Ns=10, Nd=6, K=3, C=C, T=T)

    def loss_fused(h_, et_):
        with pltpu.force_tpu_interpret_mode():
            out = fused_gather_mix_aggregate(h_, nn_idx, et_, C, T, aggregator)
        return jnp.sum(out * jnp.cos(out))

    def loss_xla(h_, et_):
        out = _xla_ref(h_, nn_idx, et_, C, T, aggregator)
        return jnp.sum(out * jnp.cos(out))

    gh_f, ge_f = jax.grad(loss_fused, argnums=(0, 1))(h, etype)
    gh_x, ge_x = jax.grad(loss_xla, argnums=(0, 1))(h, etype)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_x),
                               rtol=1e-4, atol=1e-4)


def test_typed_mp_conv_pallas_dispatch(rng, monkeypatch):
    """With the env switch forced on, typed_mp_conv must give the same
    result through the fused path (interpret mode)."""
    import fgnn_tpu.ops.typed_mp as tm

    C, T = 8, 2
    h_x = rng.randn(2, 10, 5).astype(np.float32)
    W = rng.randn(5, C * T).astype(np.float32)
    nn_idx = rng.randint(0, 10, (6, 3)).astype(np.int32)
    etype = rng.randn(2, 6, 3, T).astype(np.float32)

    ref = typed_mp_conv(jnp.asarray(h_x), jnp.asarray(nn_idx),
                        jnp.asarray(etype), jnp.asarray(W), C,
                        extension=Extension.NO_EXTENSION, aggregator="max")
    monkeypatch.setenv("FGNN_USE_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        got = typed_mp_conv(jnp.asarray(h_x), jnp.asarray(nn_idx),
                            jnp.asarray(etype), jnp.asarray(W), C,
                            extension=Extension.NO_EXTENSION, aggregator="max")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
