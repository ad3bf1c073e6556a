"""Checkpoint migration: reference torch state_dicts -> fgnn_tpu params.

Builds the reference modules (read-only import), extracts state_dicts, runs
the converters, and — where modern torch can still execute the reference
forward — asserts end-to-end activation parity with the imported weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fgnn_tpu.models import FactorNN, LDPCModel  # noqa: E402
from fgnn_tpu.models.torch_import import (  # noqa: E402
    import_factor_nn,
    import_ldpc_model,
    import_mlp,
)

from ref_torch import load_ref_mpnn, t2j_etype, t2j_feat  # noqa: E402


def _np_sd(module):
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


def test_import_factor_nn_end_to_end():
    load_ref_mpnn()
    from refmpnn.factor_mpnn_sp import FactorNN as RefFactorNN

    torch.manual_seed(11)
    rng = np.random.RandomState(12)
    B, NV, NF, hop, T = 2, 10, 5, 4, 3
    dims = [8, 8, 16, 8]
    rmod = RefFactorNN(2, [hop, NV], dims, [T, 1], nclass=2,
                       gnn_immediate_dim=8, max_mpnn_dim=16,
                       aggregator="max", ret_high=False)
    rmod.train()

    NG = 2
    node_t = torch.from_numpy(rng.randn(B, 2, NV, 1).astype(np.float32))
    hop_t = torch.from_numpy(rng.randn(B, hop, NF, 1).astype(np.float32))
    gfac_t = torch.from_numpy(rng.randn(B, NV, NG, 1).astype(np.float32))
    nn_f2v = rng.randint(0, NF, (B, NV, 2))
    nn_v2f = rng.randint(0, NV, (B, NF, 3))
    et_f2v = rng.randn(B, T, NV, 2).astype(np.float32)
    et_v2f = rng.randn(B, T, NF, 3).astype(np.float32)
    hnn_f2v = rng.randint(0, NG, (B, NV, 1))
    hnn_v2f = np.tile(np.arange(NV)[None, None], (B, NG, 1))
    het_f2v = np.ones((B, 1, NV, 1), np.float32)
    het_v2f = np.ones((B, 1, NG, NV), np.float32)

    out_t = rmod(node_t, [hop_t, gfac_t],
                 [torch.from_numpy(nn_f2v), torch.from_numpy(hnn_f2v)],
                 [torch.from_numpy(nn_v2f), torch.from_numpy(hnn_v2f)],
                 [torch.from_numpy(et_f2v), torch.from_numpy(het_f2v)],
                 [torch.from_numpy(et_v2f), torch.from_numpy(het_v2f)])

    params, stats = import_factor_nn(_np_sd(rmod), "", 2, len(dims) - 1)
    mod = FactorNN(factor_feature_dims=(hop, NV), dim_mapping_list=tuple(dims),
                   netype_list=(T, 1), nclass=2, gnn_immediate_dim=8,
                   max_mpnn_dim=16, aggregator="max")
    out_j, _ = mod.apply(
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
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t),
                               rtol=5e-4, atol=5e-4)


def test_import_full_ldpc_model_structure():
    """Construct the full reference LDPCModel tensors (the real config with
    its 1-node global factor — modern torch cannot run its forward, but the
    state_dict exists), import them, and run OUR forward."""
    load_ref_mpnn()
    from refmpnn.factor_mpnn_sp import FactorNN as RefFactorNN

    torch.manual_seed(13)

    # reference LDPCModel composition (train_ldpc.py:19-65)
    class RefLDPC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.main = RefFactorNN(2, [6, 96],
                                    [64, 64, 64, 128, 256, 256, 128, 64, 64],
                                    [4, 1], 2, skip_link={4: 3, 5: 2, 7: 0},
                                    ret_high=True, aggregator="max")
            self.emodel_f2v = torch.nn.Sequential(
                torch.nn.Conv2d(7, 64, 1), torch.nn.ReLU(inplace=True),
                torch.nn.Conv2d(64, 4, 1))
            self.emodel_v2f = torch.nn.Sequential(
                torch.nn.Conv2d(7, 64, 1), torch.nn.ReLU(inplace=True),
                torch.nn.Conv2d(64, 4, 1))
            self.nhop_regressor = torch.nn.Sequential(
                torch.nn.Linear(64, 128), torch.nn.BatchNorm1d(128),
                torch.nn.ReLU(), torch.nn.Linear(128, 128), torch.nn.ReLU(),
                torch.nn.Linear(128, 1), torch.nn.ReLU())

    ref = RefLDPC()
    params, stats = import_ldpc_model(_np_sd(ref))

    model = LDPCModel()
    rng = np.random.RandomState(14)
    B = 2
    inputs = dict(
        node_feature=jnp.asarray(rng.randn(B, 96, 2).astype(np.float32)),
        hop_feature=jnp.asarray(rng.randn(B, 48, 6).astype(np.float32)),
        nn_idx_f2v=jnp.asarray(rng.randint(0, 48, (96, 3)).astype(np.int32)),
        nn_idx_v2f=jnp.asarray(rng.randint(0, 96, (48, 6)).astype(np.int32)),
        efeature_f2v=jnp.asarray(rng.randn(B, 96, 3, 7).astype(np.float32)),
        efeature_v2f=jnp.asarray(rng.randn(B, 48, 6, 7).astype(np.float32)),
    )
    # the imported tree must be exactly the structure our model expects
    ref_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), **inputs, train=False))
    imp_shapes = jax.tree.map(lambda x: np.shape(x), params)
    exp_shapes = jax.tree.map(lambda x: tuple(x.shape), ref_vars["params"])
    assert imp_shapes == exp_shapes

    (logits, sb), _ = model.apply(
        {"params": params, "batch_stats": stats}, **inputs, train=True,
        mutable=["batch_stats"])
    assert logits.shape == (B, 48) and sb.shape == (B, 1)
    assert np.isfinite(np.asarray(logits)).all()
