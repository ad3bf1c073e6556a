"""FactorGraph IR tests: table round-trips, disjoint-union batching,
COO message ops vs the dense path."""

import numpy as np
import jax.numpy as jnp

from fgnn_tpu.graph import FactorGraph
from fgnn_tpu.ops import Extension, typed_mp_conv


def test_table_round_trip():
    factors = np.array([[0, 2, 4], [1, 3, 5], [0, 1, 2]])
    g = FactorGraph.from_factor_table(factors, n_vars=6)
    assert g.n_edges == 9
    np.testing.assert_array_equal(g.to_v2f_table(), factors)
    f2v = g.to_f2v_table()
    # var 0 is in factors 0 and 2
    assert set(f2v[0]) >= {0, 2}
    # var 4 only in factor 0 (padded -1)
    assert f2v[4][0] == 0 and f2v[4][1] == -1


def test_disjoint_union_offsets():
    g1 = FactorGraph.from_factor_table(np.array([[0, 1]]), n_vars=2)
    g2 = FactorGraph.from_factor_table(np.array([[0, 2], [1, 2]]), n_vars=3)
    u = FactorGraph.disjoint_union([g1, g2])
    assert u.n_vars == 5 and u.n_factors == 3 and u.n_edges == 6
    np.testing.assert_array_equal(np.asarray(u.var_idx), [0, 1, 2, 4, 3, 4])
    np.testing.assert_array_equal(np.asarray(u.fac_idx), [0, 0, 1, 1, 2, 2])


def test_union_equals_per_graph_compute(rng):
    """Messages on the union == per-graph messages stacked."""
    Cin, Cout, T = 5, 4, 3
    W = rng.randn(Cin, Cout * T).astype(np.float32)
    graphs, feats, ets = [], [], []
    for n_f, n_v in [(3, 7), (2, 5)]:
        table = rng.randint(0, n_v, (n_f, 4))
        g = FactorGraph.from_factor_table(table, n_vars=n_v)
        graphs.append(g)
        feats.append(rng.randn(n_v, Cin).astype(np.float32))
        ets.append(rng.randn(g.n_edges, T).astype(np.float32))

    u = FactorGraph.disjoint_union(graphs)
    out_u = u.v2f(jnp.asarray(np.concatenate(feats)),
                  jnp.asarray(np.concatenate(ets)), jnp.asarray(W), Cout)
    outs = [g.v2f(jnp.asarray(x), jnp.asarray(e), jnp.asarray(W), Cout)
            for g, x, e in zip(graphs, feats, ets)]
    np.testing.assert_allclose(np.asarray(out_u),
                               np.concatenate([np.asarray(o) for o in outs]),
                               rtol=1e-5, atol=1e-5)


def test_coo_f2v_matches_dense_gather(rng):
    """FactorGraph.f2v == the dense-table typed_mp_conv on the same graph."""
    n_v, n_f, K, Cin, Cout, T = 9, 4, 3, 5, 4, 2
    table = rng.randint(0, n_v, (n_f, K))
    g = FactorGraph.from_factor_table(table, n_vars=n_v)
    fac_x = rng.randn(n_f, Cin).astype(np.float32)
    W = rng.randn(Cin, Cout * T).astype(np.float32)

    # dense: each var gathers its incident factors; build the table
    f2v_table = g.to_f2v_table()
    mask = f2v_table >= 0
    dense_idx = np.where(mask, f2v_table, 0).astype(np.int32)
    et_dense = rng.randn(1, n_v, dense_idx.shape[1], T).astype(np.float32)
    # kill padded slots' contribution by matching the COO mask
    et_coo = np.zeros((g.n_edges, T), np.float32)
    # map dense (v, slot) -> edge: iterate edges and fill
    var = np.asarray(g.var_idx)
    fac = np.asarray(g.fac_idx)
    fill = np.zeros(n_v, np.int64)
    emask = np.ones(g.n_edges, bool)
    for e in range(g.n_edges):
        v = var[e]
        et_coo[e] = et_dense[0, v, fill[v]]
        fill[v] += 1

    out_coo = g.f2v(jnp.asarray(fac_x), jnp.asarray(et_coo), jnp.asarray(W),
                    Cout, aggregator="max")
    # dense path with -inf masking on padded slots
    dense = typed_mp_conv(jnp.asarray(fac_x[None]), jnp.asarray(dense_idx),
                          jnp.asarray(np.where(mask[None, :, :, None],
                                               et_dense, 0.0)),
                          jnp.asarray(W), Cout,
                          extension=Extension.NO_EXTENSION, aggregator="max")
    # rows where every slot is real must agree exactly
    full_rows = mask.all(axis=1)
    np.testing.assert_allclose(np.asarray(out_coo)[full_rows],
                               np.asarray(dense)[0][full_rows],
                               rtol=1e-5, atol=1e-5)


def test_pad_to_static_shape(rng):
    g = FactorGraph.from_factor_table(rng.randint(0, 5, (2, 3)), n_vars=5)
    gp = g.pad_to(16)
    assert gp.n_edges == 16
    assert int(gp.edge_mask.sum()) == 6
    x = rng.randn(5, 4).astype(np.float32)
    W = rng.randn(4, 3 * 2).astype(np.float32)
    et = rng.randn(6, 2).astype(np.float32)
    etp = np.zeros((16, 2), np.float32)
    etp[:6] = et
    np.testing.assert_allclose(
        np.asarray(gp.v2f(jnp.asarray(x), jnp.asarray(etp), jnp.asarray(W), 3)),
        np.asarray(g.v2f(jnp.asarray(x), jnp.asarray(et), jnp.asarray(W), 3)),
        rtol=1e-5, atol=1e-5)
