"""Disjoint-union COO batching end to end: the FactorGraph IR is
load-bearing for the hop workload.

The flat SynHopFactorModelCoo shares its parameter tree with the dense
SynHopFactorModel; on uniform chain lengths the two must agree, and on
heterogeneous lengths the flat model must equal per-sample dense runs
(eval mode; train mode differs only by BatchNorm batching semantics —
batch stats over the union vs over one sample — which is the point of
batching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgnn_tpu.data.tables import high_factor_table, pw_factor_table
from fgnn_tpu.graph import FactorGraph, build_joint_coo
from fgnn_tpu.models import SynHopFactorModel, SynHopFactorModelCoo
from fgnn_tpu.ops.segment import CooGraph

HOP = 9
TOL = dict(rtol=2e-4, atol=2e-4)


def _sample_inputs(rng, L):
    x = rng.rand(L, 2).astype(np.float32)
    pws = rng.rand(L, 4).astype(np.float32)
    hops = rng.rand(L, HOP).astype(np.float32)
    return x, pws, hops


def _flat_inputs(samples):
    """samples: list of (x, pws, hops, L). Returns flat model inputs."""
    Ls = [s[3] for s in samples]
    pw_tabs, pw_efs, hi_tabs, hi_efs = [], [], [], []
    for _, _, _, L in samples:
        t, e = pw_factor_table(L)
        pw_tabs.append(t)
        pw_efs.append(e)
        t, e = high_factor_table(L, HOP)
        hi_tabs.append(t)
        hi_efs.append(e)
    coo_pw, ef_pw, _ = build_joint_coo(pw_tabs, pw_efs, Ls)
    coo_hi, ef_hi, _ = build_joint_coo(hi_tabs, hi_efs, Ls)
    node = jnp.asarray(np.concatenate([s[0] for s in samples]))
    pws = jnp.asarray(np.concatenate([s[1] for s in samples]))
    hops = jnp.asarray(np.concatenate([s[2] for s in samples]))
    return node, pws, hops, coo_pw, ef_pw, coo_hi, ef_hi


@pytest.mark.parametrize("train_mode", [True, False])
def test_uniform_coo_equals_dense(rng, train_mode):
    B, L = 3, 12
    samples = [(*_sample_inputs(rng, L), L) for _ in range(B)]

    nn_pw, ef_pw_tab = pw_factor_table(L)
    nn_hi, ef_hi_tab = high_factor_table(L, HOP)
    xb = jnp.asarray(np.stack([s[0] for s in samples]))
    pwb = jnp.asarray(np.stack([s[1] for s in samples]))
    hob = jnp.asarray(np.stack([s[2] for s in samples]))

    dense = SynHopFactorModel(hop_order=HOP)
    variables = dense.init(jax.random.PRNGKey(0), xb, pwb, hob,
                           jnp.asarray(nn_pw), jnp.asarray(ef_pw_tab),
                           jnp.asarray(nn_hi), jnp.asarray(ef_hi_tab),
                           train=False)
    if train_mode:
        out_d, _ = dense.apply(variables, xb, pwb, hob,
                               jnp.asarray(nn_pw), jnp.asarray(ef_pw_tab),
                               jnp.asarray(nn_hi), jnp.asarray(ef_hi_tab),
                               train=True, mutable=["batch_stats"])
    else:
        out_d = dense.apply(variables, xb, pwb, hob,
                            jnp.asarray(nn_pw), jnp.asarray(ef_pw_tab),
                            jnp.asarray(nn_hi), jnp.asarray(ef_hi_tab),
                            train=False)

    flat_in = _flat_inputs(samples)
    coo = SynHopFactorModelCoo(hop_order=HOP)
    # IDENTICAL parameter tree: the dense variables drive the flat model
    if train_mode:
        out_c, _ = coo.apply(variables, *flat_in, train=True,
                             mutable=["batch_stats"])
    else:
        out_c = coo.apply(variables, *flat_in, train=False)

    np.testing.assert_allclose(
        np.asarray(out_c).reshape(B, L, 2), np.asarray(out_d), **TOL)


def test_ragged_coo_equals_per_sample_dense(rng):
    """Heterogeneous chain lengths in ONE flat batch == per-sample dense
    runs (eval mode: InstanceNorm is per-sample via seg ids, BatchNorm uses
    running stats)."""
    lengths = [8, 12, 15]
    samples = [(*_sample_inputs(rng, L), L) for L in lengths]

    # params init from the dense model at some L
    nn_pw, ef_pw_tab = pw_factor_table(8)
    nn_hi, ef_hi_tab = high_factor_table(8, HOP)
    dense = SynHopFactorModel(hop_order=HOP)
    variables = dense.init(
        jax.random.PRNGKey(1), jnp.asarray(samples[0][0][None]),
        jnp.asarray(samples[0][1][None]), jnp.asarray(samples[0][2][None]),
        jnp.asarray(nn_pw), jnp.asarray(ef_pw_tab),
        jnp.asarray(nn_hi), jnp.asarray(ef_hi_tab), train=False)

    flat_in = _flat_inputs(samples)
    out_c = SynHopFactorModelCoo(hop_order=HOP).apply(
        variables, *flat_in, train=False)
    out_c = np.asarray(out_c)

    off = 0
    for x, pws, hops, L in samples:
        t_pw, e_pw = pw_factor_table(L)
        t_hi, e_hi = high_factor_table(L, HOP)
        out_d = dense.apply(
            variables, jnp.asarray(x[None]), jnp.asarray(pws[None]),
            jnp.asarray(hops[None]), jnp.asarray(t_pw), jnp.asarray(e_pw),
            jnp.asarray(t_hi), jnp.asarray(e_hi), train=False)
        np.testing.assert_allclose(out_c[off:off + L], np.asarray(out_d)[0],
                                   err_msg=f"L={L}", **TOL)
        off += L


def test_ragged_train_step_runs(rng):
    """Gradients flow through the flat path (train mode, ragged batch)."""
    lengths = [8, 11]
    samples = [(*_sample_inputs(rng, L), L) for L in lengths]
    flat_in = _flat_inputs(samples)
    labels = jnp.asarray(
        np.concatenate([rng.randint(0, 2, L) for L in lengths]))

    model = SynHopFactorModelCoo(hop_order=HOP)
    variables = model.init(jax.random.PRNGKey(2), *flat_in, train=False)

    def loss_fn(params):
        out, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            *flat_in, train=True, mutable=["batch_stats"])
        logp = jax.nn.log_softmax(out)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_factor_graph_to_coo_roundtrip(rng):
    g = FactorGraph.from_factor_table(
        rng.randint(0, 10, (6, 3)), n_vars=10)
    coo = g.to_coo()
    assert isinstance(coo, CooGraph)
    assert coo.num_nodes == 16
    assert int(coo.dst.min()) >= 10  # factors after vars


def test_hop_trainer_coo_mode_matches_dense(rng):
    """The --coo trainer mode: identical param tree and (to f32 tolerance)
    identical loss trajectory vs the dense path for the first steps."""
    import argparse

    from fgnn_tpu.data import batches
    from fgnn_tpu.train.synthetic import (
        SynWorkload,
        create_state,
        make_train_step,
    )

    def make_args(coo):
        return argparse.Namespace(
            chain_length=10, hop_cap=5, hop_order=HOP, model_name="mp_nn_factor",
            neighbour=8, batch_size=4, seed=3, coo=coo, dims=(8, 8, 16, 2))

    losses = {}
    for coo in (False, True):
        args = make_args(coo)
        wl = SynWorkload("hop", args)
        gen = batches(wl.dataset, args.batch_size, 3)
        batch0 = next(gen)
        state, tx = create_state(wl, batch0, args.seed)
        step = make_train_step(wl, tx)
        ls = []
        for batch in [batch0] + list(gen):
            state, m = step(state, batch)
            ls.append(float(m["loss"]))
        losses[coo] = ls

    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4,
                               atol=2e-4)


def test_mixed_length_trainer_end_to_end(tmp_path):
    """The --coo --mixed-lengths trainer mode: heterogeneous chain lengths
    in every batch, zero padding, one compile — through the full
    train_and_eval CLI engine (train + checkpoint + eval)."""
    from fgnn_tpu.train.synthetic import parse_args, train_and_eval

    args = parse_args(
        ["--train-epoches", "1", "--train-size", "8", "--test-size", "4",
         "--batch-size", "2", "--coo", "--mixed-lengths", "9,12,15",
         "--workers", "0", "--work-dir", str(tmp_path)], "hop")
    acc, lp_acc = train_and_eval("hop", args)
    assert 0.0 <= acc <= 1.0 and 0.0 <= lp_acc <= 1.0


def test_bucketed_length_trainer_end_to_end(tmp_path):
    """--coo --mixed-lengths --length-dist: a genuinely heterogeneous
    length DISTRIBUTION, bucketed into homogeneous per-length batches
    (one compile per bucket), through the full train_and_eval engine."""
    from fgnn_tpu.train.synthetic import parse_args, train_and_eval

    args = parse_args(
        ["--train-epoches", "1", "--train-size", "12", "--test-size", "6",
         "--batch-size", "2", "--coo", "--mixed-lengths", "9,12,15",
         "--length-dist", "0.5,0.3,0.2",
         "--workers", "0", "--work-dir", str(tmp_path)], "hop")
    acc, lp_acc = train_and_eval("hop", args)
    assert 0.0 <= acc <= 1.0 and 0.0 <= lp_acc <= 1.0


def test_bucketed_sampler_distribution_and_shapes():
    """BucketedHopData: every batch is homogeneous in one of the
    configured lengths, and the run-level bucket frequencies follow the
    configured distribution."""
    from fgnn_tpu.data import BucketedHopData

    ds = BucketedHopData([8, 11, 13], [0.6, 0.3, 0.1], hop_order=5, seed=0)
    seen = {8: 0, 11: 0, 13: 0}
    for b in ds.batches(3, 60):
        L = b["node_feature"].shape[1]
        assert b["node_feature"].shape == (3, L, 2)
        assert b["label"].shape == (3, L)
        assert L in seen
        seen[L] += 1
    assert seen[8] > seen[13]  # 0.6 vs 0.1 over 60 draws
    assert sum(seen.values()) == 60
    assert all(v > 0 for v in seen.values())


def test_mixed_length_composite_sampler(rng):
    """MixedLengthHopData samples are ragged concatenations with exact
    per-chain oracle labels (no padding rows anywhere)."""
    from fgnn_tpu.data import MixedLengthHopData

    ds = MixedLengthHopData([8, 11, 13], hop_order=5, seed=0)
    s = ds.sample()
    assert s["node_feature"].shape == (32, 2)  # 8 + 11 + 13, zero padding
    assert s["label"].shape == (32,)
    assert s["efeature_hop"].shape == (32, 5)
    s2 = ds.sample()
    assert not np.array_equal(s["node_feature"], s2["node_feature"])
