"""Golden activation-parity tests: fgnn_tpu modules vs the reference torch
modules run side by side with transplanted weights (SURVEY.md §4 strategy).

The reference runs on CPU torch; our modules run on CPU JAX; outputs must
match to float32 tolerance in both train (batch-stats) and eval
(running-stats) modes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fgnn_tpu.models import (  # noqa: E402
    FactorMPNN,
    FactorNN,
    MPConv,
    MPConvResidual,
)
from fgnn_tpu.ops import Extension  # noqa: E402

from ref_torch import (  # noqa: E402
    factor_mpnn_params,
    factor_nn_params,
    load_ref_mpnn,
    mp_conv_params,
    mp_conv_residual_params,
    t2j_etype,
    t2j_feat,
)

TOL = dict(rtol=1e-4, atol=1e-4)


def make_graph(rng, B, N, K, T, n_src=None):
    n_src = n_src or N
    nn_idx = rng.randint(0, n_src, (B, N, K))
    etype_t = rng.randn(B, T, N, K).astype(np.float32)
    return nn_idx, etype_t


@pytest.mark.parametrize("extension,tname", [
    (Extension.NO_EXTENSION, "NO_EXTENSION"),
    (Extension.ORIG_WITH_NEIGHBOR, "ORIG_WITH_NEIGHBOR"),
    (Extension.ORIG_WITH_DIFF, "ORIG_WITH_DIFF"),
])
@pytest.mark.parametrize("aggregator", ["max", "softmax", "mean"])
def test_mp_conv_v2_parity(extension, tname, aggregator):
    ref = load_ref_mpnn()
    from refmpnn.mp_nn import mp_conv_type, mp_conv_v2

    torch.manual_seed(0)
    rng = np.random.RandomState(1)
    B, N, K, Cin, Cout, T = 3, 11, 4, 6, 5, 7
    rmod = mp_conv_v2(Cin, Cout, T, extension=getattr(mp_conv_type, tname),
                      aggregtor=aggregator)
    rmod.train()

    x_t = torch.from_numpy(rng.randn(B, Cin, N, 1).astype(np.float32))
    nn_idx, etype_t = make_graph(rng, B, N, K, T)
    out_t = rmod(x_t, torch.from_numpy(nn_idx), torch.from_numpy(etype_t))

    params, stats = mp_conv_params(rmod)
    mod = MPConv(nout=Cout, nedge_types=T, extension=extension,
                 aggregator=aggregator)
    out_j, _ = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(x_t)), jnp.asarray(nn_idx.astype(np.int32)),
        jnp.asarray(t2j_etype(torch.from_numpy(etype_t))),
        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), **TOL)

    # eval mode: running stats (fresh module has mean=0, var=1)
    rmod.eval()
    out_t_eval = rmod(x_t, torch.from_numpy(nn_idx), torch.from_numpy(etype_t))
    out_j_eval = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(x_t)), jnp.asarray(nn_idx.astype(np.int32)),
        jnp.asarray(t2j_etype(torch.from_numpy(etype_t))), train=False)
    np.testing.assert_allclose(np.asarray(out_j_eval), t2j_feat(out_t_eval), **TOL)


def test_mp_conv_residual_parity():
    load_ref_mpnn()
    from refmpnn.mp_nn_residual import mp_conv_residual

    torch.manual_seed(2)
    rng = np.random.RandomState(3)
    B, N, K, C, T, nmed = 2, 9, 3, 8, 4, 6
    rmod = mp_conv_residual(C, nmed, T)
    rmod.train()

    x_t = torch.from_numpy(rng.randn(B, C, N, 1).astype(np.float32))
    nn_idx, etype_t = make_graph(rng, B, N, K, T)
    out_t = rmod(x_t, torch.from_numpy(nn_idx), torch.from_numpy(etype_t))

    params, stats = mp_conv_residual_params(rmod)
    mod = MPConvResidual(nmed=nmed, nedge_types=T)
    out_j, _ = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(x_t)), jnp.asarray(nn_idx.astype(np.int32)),
        jnp.asarray(t2j_etype(torch.from_numpy(etype_t))),
        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), **TOL)


def test_running_stats_update_parity():
    """BatchNorm running-average updates must match torch momentum semantics."""
    load_ref_mpnn()
    from refmpnn.mp_nn import mp_conv_v2

    torch.manual_seed(4)
    rng = np.random.RandomState(5)
    B, N, K, Cin, Cout, T = 4, 7, 3, 5, 6, 2
    rmod = mp_conv_v2(Cin, Cout, T, extension=load_ref_mpnn().mp_nn.mp_conv_type.NO_EXTENSION)
    rmod.train()
    params, stats = mp_conv_params(rmod)
    mod = MPConv(nout=Cout, nedge_types=T, extension=Extension.NO_EXTENSION)

    variables = {"params": params, "batch_stats": stats}
    for step in range(3):
        x_t = torch.from_numpy(rng.randn(B, Cin, N, 1).astype(np.float32))
        nn_idx, etype_t = make_graph(rng, B, N, K, T)
        rmod(x_t, torch.from_numpy(nn_idx), torch.from_numpy(etype_t))
        _, upd = mod.apply(
            variables, jnp.asarray(t2j_feat(x_t)),
            jnp.asarray(nn_idx.astype(np.int32)),
            jnp.asarray(t2j_etype(torch.from_numpy(etype_t))),
            train=True, mutable=["batch_stats"])
        variables = {"params": params, **upd}

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["bn"]["mean"]),
        rmod.bn.running_mean.detach().numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["bn"]["var"]),
        rmod.bn.running_var.detach().numpy(), rtol=1e-3, atol=1e-5)


def test_factor_nn_parity_ldpc_shape():
    """Bipartite FactorNN on (scaled-down) LDPC-like structure, incl. the
    1-node global factor type, skip links, and every layer-selection branch."""
    load_ref_mpnn()
    from refmpnn.factor_mpnn_sp import FactorNN as RefFactorNN

    torch.manual_seed(6)
    rng = np.random.RandomState(7)
    B = 2
    NV, NF = 12, 6            # variables, checks
    hop, T = 4, 3             # check degree-ish feature dim, edge types
    dims = [8, 8, 16, 40, 16, 8]   # exercises ==, <=max, >max branches
    max_dim = 16

    rmod = RefFactorNN(2, [hop, NV], dims, [T, 1], nclass=2,
                       gnn_immediate_dim=8, max_mpnn_dim=max_dim,
                       skip_link={3: 1}, aggregator="max", ret_high=True)
    rmod.train()

    node_t = torch.from_numpy(rng.randn(B, 2, NV, 1).astype(np.float32))
    hop_t = torch.from_numpy(rng.randn(B, hop, NF, 1).astype(np.float32))
    # NOTE: the reference's LDPC global factor has exactly ONE factor node;
    # modern torch raises on InstanceNorm2d with a single spatial element,
    # so the torch-vs-jax comparison uses 2 global factors (the 1-node case
    # is covered by test_instance_norm_single_node below).
    NG = 2
    gfac_t = torch.from_numpy(rng.randn(B, NV, NG, 1).astype(np.float32))

    nn_f2v = rng.randint(0, NF, (B, NV, 2))
    nn_v2f = rng.randint(0, NV, (B, NF, 4))
    et_f2v = rng.randn(B, T, NV, 2).astype(np.float32)
    et_v2f = rng.randn(B, T, NF, 4).astype(np.float32)
    hnn_f2v = rng.randint(0, NG, (B, NV, 1))
    hnn_v2f = np.tile(np.arange(NV)[None, None], (B, NG, 1))
    het_f2v = np.ones((B, 1, NV, 1), np.float32)
    het_v2f = np.ones((B, 1, NG, NV), np.float32)

    out_t, high_t = rmod(
        node_t, [hop_t, gfac_t],
        [torch.from_numpy(nn_f2v), torch.from_numpy(hnn_f2v)],
        [torch.from_numpy(nn_v2f), torch.from_numpy(hnn_v2f)],
        [torch.from_numpy(et_f2v), torch.from_numpy(het_f2v)],
        [torch.from_numpy(et_v2f), torch.from_numpy(het_v2f)])

    params, stats = factor_nn_params(rmod)
    mod = FactorNN(factor_feature_dims=(hop, NV), dim_mapping_list=tuple(dims),
                   netype_list=(T, 1), nclass=2, gnn_immediate_dim=8,
                   max_mpnn_dim=max_dim, skip_link={3: 1}, aggregator="max",
                   ret_high=True)
    (out_j, high_j), _ = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(node_t)),
        [jnp.asarray(t2j_feat(hop_t)), jnp.asarray(t2j_feat(gfac_t))],
        [jnp.asarray(nn_f2v.astype(np.int32)), jnp.asarray(hnn_f2v.astype(np.int32))],
        [jnp.asarray(nn_v2f.astype(np.int32)), jnp.asarray(hnn_v2f.astype(np.int32))],
        [jnp.asarray(t2j_etype(torch.from_numpy(et_f2v))),
         jnp.asarray(t2j_etype(torch.from_numpy(het_f2v)))],
        [jnp.asarray(t2j_etype(torch.from_numpy(et_v2f))),
         jnp.asarray(t2j_etype(torch.from_numpy(het_v2f)))],
        train=True, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), rtol=5e-4, atol=5e-4)
    for hj, ht in zip(high_j, high_t):
        np.testing.assert_allclose(np.asarray(hj), t2j_feat(ht), rtol=5e-4, atol=5e-4)


def test_instance_norm_single_node():
    """InstanceNorm over a single node must give exactly 0 (then ReLU -> 0),
    the old-torch semantics the reference's 1-node global LDPC factor relies
    on (factor_mpnn_sp.py:68 applied to a (B, C, 1, 1) feature)."""
    from fgnn_tpu.models import InstanceNorm

    x = jnp.asarray(np.random.RandomState(0).randn(3, 1, 8).astype(np.float32))
    out = InstanceNorm().apply({}, x)
    np.testing.assert_allclose(np.asarray(out), np.zeros_like(out), atol=1e-6)


def test_factor_mpnn_parity():
    """Concat-formulation factor_mpnn with all three layer branches and a
    skip link, on a joint [vars ; factors] graph."""
    load_ref_mpnn()
    from refmpnn.factor_mpnn import factor_mpnn as RefFactorMPNN

    torch.manual_seed(8)
    rng = np.random.RandomState(9)
    B, L = 2, 10                  # chain length
    dims = [8, 8, 16, 40, 16, 8]  # ==, <=, >max(16) branches
    T = 5

    rmod = RefFactorMPNN(2, [4, 3], dims, [T, T], gnn_immediate_dim=8,
                         max_mpnn_dim=16, skip_link={3: 1})
    rmod.train()

    node_t = torch.from_numpy(rng.randn(B, 2, L, 1).astype(np.float32))
    fac1_t = torch.from_numpy(rng.randn(B, 4, L, 1).astype(np.float32))
    fac2_t = torch.from_numpy(rng.randn(B, 3, L, 1).astype(np.float32))

    graphs_t, graphs_j = [], []
    for nf in (L, L):
        NJ = L + nf
        nn_idx = rng.randint(0, NJ, (B, NJ, 3))
        et = rng.randn(B, T, NJ, 3).astype(np.float32)
        graphs_t.append([torch.from_numpy(nn_idx), torch.from_numpy(et)])
        graphs_j.append((jnp.asarray(nn_idx.astype(np.int32)),
                         jnp.asarray(t2j_etype(torch.from_numpy(et)))))

    out_t, fs_t = rmod(node_t, [fac1_t, fac2_t], graphs_t)

    params, stats = factor_mpnn_params(rmod)
    mod = FactorMPNN(factor_feature_dims=(4, 3), dim_mapping_list=tuple(dims),
                     netype_list=(T, T), gnn_immediate_dim=8, max_mpnn_dim=16,
                     skip_link={3: 1})
    (out_j, fs_j), _ = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(node_t)),
        [jnp.asarray(t2j_feat(fac1_t)), jnp.asarray(t2j_feat(fac2_t))],
        graphs_j, train=True, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), rtol=5e-4, atol=5e-4)
    for fj, ft in zip(fs_j, fs_t):
        np.testing.assert_allclose(np.asarray(fj), t2j_feat(ft), rtol=5e-4, atol=5e-4)
