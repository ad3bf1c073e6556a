"""Unit tests of the typed-edge message passing op against a straightforward
numpy transcription of the math spec (SURVEY.md §2.1.1, mp_nn.py:115-175)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fgnn_tpu.ops import (
    Extension,
    typed_mp_conv,
    typed_mp_conv_coo,
    segment_logsumexp,
)


def np_reference(x, nn_idx, etype, W, nout, extension, aggregator, gamma=3.0, bias=None):
    """Direct per-edge numpy implementation of the spec."""
    B, Ns, Cin = x.shape
    if nn_idx.ndim == 2:
        nn_idx = np.broadcast_to(nn_idx[None], (B,) + nn_idx.shape)
    _, Nd, K = nn_idx.shape
    T = etype.shape[-1]
    # W columns laid out c_out * T + t
    Wt = W.reshape(W.shape[0], nout, T)  # (Cin[*2], nout, T)
    msgs = np.zeros((B, Nd, K, nout))
    for b in range(B):
        for i in range(Nd):
            for k in range(K):
                j = nn_idx[b, i, k]
                if extension == Extension.NO_EXTENSION:
                    inp = x[b, j]
                elif extension == Extension.ORIG_WITH_NEIGHBOR:
                    inp = np.concatenate([x[b, i], x[b, j]])
                else:
                    inp = np.concatenate([x[b, i], x[b, i] - x[b, j]])
                per_type = np.einsum("c,cdt->dt", inp, Wt)  # (nout, T)
                msgs[b, i, k] = per_type @ etype[b, i, k]
    if aggregator == "max":
        out = msgs.max(axis=2)
    elif aggregator == "softmax":
        m = msgs.max(axis=2, keepdims=True)
        out = (m + np.log(np.exp(gamma * (msgs - m)).sum(axis=2, keepdims=True)) / gamma).squeeze(2)
    else:
        out = msgs.mean(axis=2)
    if bias is not None:
        out = out + bias
    return out


@pytest.mark.parametrize("extension", list(Extension))
@pytest.mark.parametrize("aggregator", ["max", "softmax", "mean"])
def test_typed_mp_conv_matches_spec(rng, extension, aggregator):
    B, N, K, Cin, Cout, T = 2, 7, 3, 5, 4, 6
    x = rng.randn(B, N, Cin).astype(np.float32)
    nn_idx = rng.randint(0, N, (B, N, K)).astype(np.int32)
    etype = rng.randn(B, N, K, T).astype(np.float32)
    cin_eff = Cin if extension == Extension.NO_EXTENSION else 2 * Cin
    W = rng.uniform(-0.1, 0.1, (cin_eff, Cout * T)).astype(np.float32)
    bias = rng.uniform(0, 0.05, (Cout,)).astype(np.float32)

    got = typed_mp_conv(
        jnp.asarray(x), jnp.asarray(nn_idx), jnp.asarray(etype), jnp.asarray(W),
        Cout, extension=extension, aggregator=aggregator, bias=jnp.asarray(bias))
    want = np_reference(x, nn_idx, etype, W, Cout, extension, aggregator, bias=bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_shared_nn_idx_bipartite(rng):
    """Bipartite graph with shared (N_dst, K) table: N_dst != N_src."""
    B, Ns, Nd, K, Cin, Cout, T = 3, 10, 4, 5, 6, 3, 2
    x = rng.randn(B, Ns, Cin).astype(np.float32)
    nn_idx = rng.randint(0, Ns, (Nd, K)).astype(np.int32)
    etype = rng.randn(B, Nd, K, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)

    got = typed_mp_conv(
        jnp.asarray(x), jnp.asarray(nn_idx), jnp.asarray(etype), jnp.asarray(W),
        Cout, extension=Extension.NO_EXTENSION, aggregator="max")
    want = np_reference(x, nn_idx, etype, W, Cout, Extension.NO_EXTENSION, "max")
    assert got.shape == (B, Nd, Cout)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("aggregator", ["max", "softmax", "mean", "sum"])
def test_coo_matches_dense(rng, aggregator):
    """COO path == dense path on an equivalent edge list (single graph)."""
    Ns, Nd, K, Cin, Cout, T = 9, 6, 4, 5, 3, 2
    x = rng.randn(Ns, Cin).astype(np.float32)
    nn_idx = rng.randint(0, Ns, (Nd, K)).astype(np.int32)
    etype = rng.randn(1, Nd, K, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)

    dense = typed_mp_conv(
        jnp.asarray(x[None]), jnp.asarray(nn_idx), jnp.asarray(etype),
        jnp.asarray(W), Cout, extension=Extension.NO_EXTENSION,
        aggregator=aggregator if aggregator != "sum" else "mean")
    if aggregator == "sum":
        dense = dense * K  # mean * K == sum for full segments

    src = nn_idx.reshape(-1)
    dst = np.repeat(np.arange(Nd), K)
    coo = typed_mp_conv_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(etype[0].reshape(-1, T)), jnp.asarray(W), Cout, Nd,
        aggregator=aggregator)
    np.testing.assert_allclose(np.asarray(coo), np.asarray(dense)[0], rtol=2e-4, atol=2e-4)


def test_segment_logsumexp_masked(rng):
    data = rng.randn(10).astype(np.float32)
    seg = np.array([0, 0, 0, 1, 1, 1, 1, 2, 2, 2], dtype=np.int32)
    got = segment_logsumexp(jnp.asarray(data), jnp.asarray(seg), 3, gamma=3.0)
    for s in range(3):
        vals = data[seg == s]
        want = np.log(np.exp(3.0 * vals).sum()) / 3.0
        np.testing.assert_allclose(got[s], want, rtol=1e-5, atol=1e-5)


def test_gather_nodes_onehot_matches_indexing(rng):
    """The one-hot matmul rewrite of the shared-table gather is exact,
    and the large-graph fallback indexes identically."""
    import fgnn_tpu.ops.typed_mp as tm

    x = rng.randn(3, 20, 7).astype(np.float32)
    idx = rng.randint(0, 20, (11, 4)).astype(np.int32)
    want = x[:, idx]

    got = tm.gather_nodes(jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), want)

    # force the fallback (as if n_src exceeded the one-hot threshold)
    old = tm._ONEHOT_MAX_SRC
    try:
        tm._ONEHOT_MAX_SRC = 1
        got_fb = tm.gather_nodes(jnp.asarray(x), jnp.asarray(idx))
    finally:
        tm._ONEHOT_MAX_SRC = old
    np.testing.assert_array_equal(np.asarray(got_fb), want)


def test_device_prefetch_roundtrip():
    """device_prefetch yields device-resident batches, in order, and
    propagates generator errors."""
    import jax
    import pytest as _pytest

    from fgnn_tpu.data import device_prefetch

    batches = [{"a": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["a"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["a"]), batches[i]["a"])

    def boom():
        yield batches[0]
        raise RuntimeError("generator failed")

    it = device_prefetch(boom())
    next(it)
    with _pytest.raises(RuntimeError, match="generator failed"):
        list(it)


# ---------------------------------------------------------------------------
# trivial-gather shortcuts (concrete tables, typed_mp.py _trivial_gather)
# ---------------------------------------------------------------------------


def test_trivial_gather_single_source(rng):
    """n_src == 1 all-zeros table lowers to a broadcast — parity + grads."""
    import jax

    B, Nd, K, T, Cin, Cout = 3, 10, 2, 1, 5, 4
    x = rng.randn(B, 1, Cin).astype(np.float32)
    nn_idx = np.zeros((Nd, K), np.int32)
    etype = rng.randn(B, Nd, K, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32) * 0.1

    got = typed_mp_conv(jnp.asarray(x), nn_idx, jnp.asarray(etype),
                        jnp.asarray(W), Cout,
                        extension=Extension.NO_EXTENSION, aggregator="max")
    want = np_reference(x, nn_idx, etype, W, Cout,
                        Extension.NO_EXTENSION, "max")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def loss(x, et, w):
        return jnp.sum(jnp.sin(typed_mp_conv(
            x, nn_idx, et, w, Cout, extension=Extension.NO_EXTENSION,
            aggregator="max")))

    gx, get, gw = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(etype), jnp.asarray(W))
    eps = 1e-3
    x2 = x.copy()
    x2[0, 0, 0] += eps
    num = (np.sin(np_reference(x2, nn_idx, etype, W, Cout,
                               Extension.NO_EXTENSION, "max")).sum()
           - np.sin(np_reference(x, nn_idx, etype, W, Cout,
                                 Extension.NO_EXTENSION, "max")).sum()) / eps
    np.testing.assert_allclose(float(gx[0, 0, 0]), num, rtol=2e-2)
    assert np.isfinite(np.asarray(get)).all()
    assert np.isfinite(np.asarray(gw)).all()


def test_trivial_gather_identity_cover(rng):
    """arange-identity table lowers to a reshape — parity + grad check."""
    import jax

    B, Nd, K, T, Cin, Cout = 2, 4, 3, 2, 6, 5
    n_src = Nd * K
    x = rng.randn(B, n_src, Cin).astype(np.float32)
    nn_idx = np.arange(n_src, dtype=np.int32).reshape(Nd, K)
    etype = rng.randn(B, Nd, K, T).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32) * 0.1

    got = typed_mp_conv(jnp.asarray(x), nn_idx, jnp.asarray(etype),
                        jnp.asarray(W), Cout,
                        extension=Extension.NO_EXTENSION,
                        aggregator="softmax")
    want = np_reference(x, nn_idx, etype, W, Cout,
                        Extension.NO_EXTENSION, "softmax")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def loss(x):
        return jnp.sum(typed_mp_conv(
            x, nn_idx, jnp.asarray(etype), jnp.asarray(W), Cout,
            extension=Extension.NO_EXTENSION, aggregator="softmax"))

    gx = jax.grad(loss)(jnp.asarray(x))
    eps = 1e-3
    x2 = x.copy()
    x2[1, 3, 2] += eps
    num = (np_reference(x2, nn_idx, etype, W, Cout,
                        Extension.NO_EXTENSION, "softmax").sum()
           - np_reference(x, nn_idx, etype, W, Cout,
                          Extension.NO_EXTENSION, "softmax").sum()) / eps
    np.testing.assert_allclose(float(gx[1, 3, 2]), num, rtol=2e-2)


def test_trivial_gather_invalid_single_source_table(rng):
    """A non-zero n_src==1 table must NOT silently broadcast row 0: the
    shortcut declines and the general path's one-hot gather yields zero
    rows for the out-of-range index (documented precondition)."""
    B, Nd, K, T, Cin, Cout = 2, 4, 1, 1, 3, 2
    x = rng.randn(B, 1, Cin).astype(np.float32)
    bad = np.full((Nd, K), 7, np.int32)  # out of range for n_src == 1
    etype = np.ones((B, Nd, K, T), np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)
    out = typed_mp_conv(jnp.asarray(x), bad, jnp.asarray(etype),
                        jnp.asarray(W), Cout,
                        extension=Extension.NO_EXTENSION, aggregator="sum")
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
