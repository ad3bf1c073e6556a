"""Full-config golden parity: the EXACT model compositions the trainers
build, torch-reference vs fgnn_tpu, with transplanted weights.

test_models_golden.py covers the building blocks at toy sizes; this file
covers the real trainer configurations end to end:

  * the static graph tables of all three synthetic trainers vs the
    reference generator functions imported straight from
    /root/reference/train_syn_*.py;
  * SynFixedModel('mp_nn') vs the mp_sequential stack of
    train_syn_fixed_pw_hop.py:120-137 at L=30, k=8;
  * SynPwFactorModel vs factor_mpnn(2, [4, 1], [64..2], [16,16]) + emodels
    (train_syn_pw_factor.py:174-189) at L=30;
  * SynHopFactorModel vs factor_mpnn(2, [4, 9], [64..2], [16,16])
    (train_syn_hop_factor.py:169-184) at L=30;
  * LDPCModel vs the real reference class imported from
    /root/reference/train_ldpc.py:19-99 (2, 6, 4, aggregator='max') on a
    real 96.3.963 batch, with the reference's 1-node-InstanceNorm global
    factor executed under the documented old-torch semantics (output 0 for
    a single spatial element — see test_models_golden.py::
    test_instance_norm_single_node).
"""

import contextlib
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fgnn_tpu.data.ldpc_datasets import (  # noqa: E402
    _stack,
    gen_sample,
    sample_to_features,
)
from fgnn_tpu.data.tables import (  # noqa: E402
    chain_knn_table,
    global_factor_table,
    high_factor_table,
    pw_factor_table,
)
from fgnn_tpu.models import (  # noqa: E402
    LDPCModel,
    SynFixedModel,
    SynHopFactorModel,
    SynPwFactorModel,
)
from fgnn_tpu.models.torch_import import import_ldpc_model  # noqa: E402

from ref_torch import (  # noqa: E402
    bn_params,
    conv2d_params,
    factor_mpnn_params,
    load_ref_mpnn,
    mp_conv_params,
    mp_conv_residual_params,
    t2j_etype,
    t2j_feat,
)

TOL = dict(rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Importing the reference trainer scripts (read-only) without their heavy
# deps: lib.data needs the compiled MNC/ad3 packages, so we stub the module
# graph and alias lib.model.mpnn to the already-loaded refmpnn package.
# ---------------------------------------------------------------------------

def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_ref_trainer(filename):
    """Import /root/reference/<filename> as a module (model classes and
    table generators only; main() is never called)."""
    modname = f"reftrainer_{filename[:-3]}"
    if modname in sys.modules:
        return sys.modules[modname]
    pkg = load_ref_mpnn()
    mpnn = _stub(
        "lib.model.mpnn",
        factor_mpnn=pkg.factor_mpnn.factor_mpnn,
        FactorNN=pkg.factor_mpnn_sp.FactorNN,
        mp_sequential=pkg.sequential.mp_sequential,
        mp_conv_residual=pkg.mp_nn_residual.mp_conv_residual,
        mp_conv_type=pkg.mp_nn.mp_conv_type,
        mp_conv_v2=pkg.mp_nn.mp_conv_v2,
        global_pooling=pkg.pooling.global_pooling,
    )
    lib_model = _stub("lib.model", mpnn=mpnn)
    lib_data = _stub("lib.data")
    _stub("lib", model=lib_model, data=lib_data)
    _stub("utils.types", str2bool=lambda v: str(v).lower() in
          ("yes", "true", "t", "y", "1"),
          to_cuda=lambda *a: a)
    _stub("utils", init_logger=lambda *a, **k: None,
          types=sys.modules["utils.types"])
    _stub("tensorboardX", SummaryWriter=object)
    _stub("tqdm", tqdm=lambda it, *a, **k: it)
    spec = importlib.util.spec_from_file_location(
        modname, f"/root/reference/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def old_torch_instance_norm():
    """Run reference modules under the OLD torch InstanceNorm semantics for
    a single spatial element: variance 0 -> (x - mean)/sqrt(0 + eps) = 0.
    Modern torch raises instead; the reference (old torch) produced zeros,
    which is what fgnn_tpu.models.InstanceNorm reproduces."""
    orig = torch.nn.functional.instance_norm

    def patched(input, *a, **k):
        if input.dim() == 4 and input.shape[2] * input.shape[3] == 1:
            return torch.zeros_like(input)
        return orig(input, *a, **k)

    torch.nn.functional.instance_norm = patched
    try:
        yield
    finally:
        torch.nn.functional.instance_norm = orig


# ---------------------------------------------------------------------------
# Static table parity vs the reference generator functions
# ---------------------------------------------------------------------------

def test_chain_knn_table_vs_reference():
    ref = load_ref_trainer("train_syn_fixed_pw_hop.py")
    nn_t, ef_t = ref.generate_knn_table(30, 8)          # (1,30,8),(1,1,30,8)
    nn_j, ef_j = chain_knn_table(30, 8)
    np.testing.assert_array_equal(nn_j, nn_t.numpy()[0])
    np.testing.assert_array_equal(ef_j[..., 0], ef_t.numpy()[0, 0])


def test_pw_factor_table_vs_reference():
    for fname in ("train_syn_pw_factor.py", "train_syn_hop_factor.py"):
        ref = load_ref_trainer(fname)
        nn_t, ef_t = ref.generate_pw_factor_table(30)   # (1,60,2),(1,3,60,2)
        nn_j, ef_j = pw_factor_table(30)
        np.testing.assert_array_equal(nn_j, nn_t.numpy()[0])
        np.testing.assert_array_equal(
            ef_j, ef_t.numpy()[0].transpose(1, 2, 0))


def test_high_factor_table_vs_reference():
    ref = load_ref_trainer("train_syn_hop_factor.py")
    nn_t, ef_t = ref.generate_high_factor_table(30, 9)  # (1,60,9),(1,2,60,9)
    nn_j, ef_j = high_factor_table(30, 9)
    np.testing.assert_array_equal(nn_j, nn_t.numpy()[0])
    np.testing.assert_array_equal(ef_j, ef_t.numpy()[0].transpose(1, 2, 0))


def test_global_factor_table_vs_reference():
    ref = load_ref_trainer("train_syn_pw_factor.py")
    nn_t, ef_t, hf_t = ref.generate_high_factor_table(30, 8)
    nn_j, ef_j, hf_j = global_factor_table(30, 8)
    np.testing.assert_array_equal(nn_j, nn_t.numpy()[0])
    np.testing.assert_array_equal(ef_j, ef_t.numpy()[0].transpose(1, 2, 0))
    np.testing.assert_array_equal(hf_j, hf_t.numpy()[0, 0])


# ---------------------------------------------------------------------------
# SynFixedModel('mp_nn') at the real config (L=30, k=8, 16 edge types)
# ---------------------------------------------------------------------------

def _build_ref_fixed_stack():
    """The 'mp_nn' model of train_syn_fixed_pw_hop.py:120-137."""
    pkg = load_ref_mpnn()
    mp_sequential = pkg.sequential.mp_sequential
    mp_conv_v2 = pkg.mp_nn.mp_conv_v2
    mp_conv_residual = pkg.mp_nn_residual.mp_conv_residual
    mp_conv_type = pkg.mp_nn.mp_conv_type
    model = mp_sequential(
        mp_conv_v2(2, 64, 16, extension=mp_conv_type.ORIG_WITH_NEIGHBOR),
        mp_conv_residual(64, 64, 16), torch.nn.Conv2d(64, 128, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(inplace=True),
        mp_conv_residual(128, 64, 16), torch.nn.Conv2d(128, 256, 1),
        torch.nn.BatchNorm2d(256), torch.nn.ReLU(inplace=True),
        mp_conv_residual(256, 64, 16), torch.nn.Conv2d(256, 128, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(inplace=True),
        mp_conv_residual(128, 64, 16), torch.nn.Conv2d(128, 64, 1),
        torch.nn.BatchNorm2d(64), torch.nn.ReLU(inplace=True),
        mp_conv_residual(64, 64, 16), torch.nn.Conv2d(64, 2, 1))
    emodel = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, 1), torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(64, 16, 1))
    return model, emodel


def _fixed_stack_params(model, emodel):
    """Map the reference stack onto SynFixedModel's flax names."""
    children = list(model.module_list)
    params_gnn, stats_gnn = {}, {}
    mpc = mpr = iid = dense = 0
    i = 0
    pkg = load_ref_mpnn()
    while i < len(children):
        c = children[i]
        if isinstance(c, pkg.mp_nn.mp_conv_v2):
            p, s = mp_conv_params(c)
            params_gnn[f"MPConv_{mpc}"] = p
            if s:
                stats_gnn[f"MPConv_{mpc}"] = s
            mpc += 1
            i += 1
        elif isinstance(c, pkg.mp_nn_residual.mp_conv_residual):
            p, s = mp_conv_residual_params(c)
            params_gnn[f"MPConvResidual_{mpr}"] = p
            stats_gnn[f"MPConvResidual_{mpr}"] = s
            mpr += 1
            i += 1
        elif isinstance(c, torch.nn.Conv2d):
            if i + 1 < len(children) and isinstance(
                    children[i + 1], torch.nn.BatchNorm2d):
                bn_p, bn_s = bn_params(children[i + 1])
                params_gnn[f"IIDBlock_{iid}"] = {
                    "conv": conv2d_params(c), "bn": bn_p}
                stats_gnn[f"IIDBlock_{iid}"] = {"bn": bn_s}
                iid += 1
                i += 3  # Conv, BN, ReLU
            else:
                params_gnn[f"Dense_{dense}"] = conv2d_params(c)
                dense += 1
                i += 1
        else:
            i += 1
    # the stack's submodules are constructed inside SynFixedModel.__call__,
    # so flax binds them as direct children of the model (not under "gnn")
    params = dict(params_gnn)
    params["emodel"] = {"dense_0": conv2d_params(emodel[0]),
                        "dense_1": conv2d_params(emodel[2])}
    return params, dict(stats_gnn)


@pytest.mark.parametrize("train_mode", [True, False])
def test_syn_fixed_full_config_golden(train_mode):
    """Eval mode matches at 5e-4.  Train mode uses a looser tolerance: the
    11-layer stack has a BatchNorm per block normalizing over only B*N=120
    samples, and each normalization divides by the batch std, amplifying
    f32 rounding noise ~2x per layer (measured: single-block parity is
    ~1e-4, full-stack worst case ~2e-3; the profile is identical under a
    float64 weight transplant, so it is accumulation, not structure)."""
    load_ref_trainer("train_syn_fixed_pw_hop.py")
    torch.manual_seed(100)
    rng = np.random.RandomState(101)
    L, k, B = 30, 8, 4

    rmodel, remodel = _build_ref_fixed_stack()
    (rmodel.train if train_mode else rmodel.eval)()
    (remodel.train if train_mode else remodel.eval)()

    ref = load_ref_trainer("train_syn_fixed_pw_hop.py")
    nn_t, ef_t = ref.generate_knn_table(L, k)
    x_t = torch.from_numpy(rng.rand(B, 2, L, 1).astype(np.float32))

    with torch.no_grad():
        etype_t = remodel(ef_t)                       # (1, 16, L, 9)
        out_t = rmodel(x_t, nn_t.repeat(B, 1, 1),
                       etype_t.repeat(B, 1, 1, 1))

    params, stats = _fixed_stack_params(rmodel, remodel)
    nn_j, ef_j = chain_knn_table(L, k)
    model = SynFixedModel(variant="mp_nn")
    if train_mode:
        out_j, _ = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(t2j_feat(x_t)), jnp.asarray(nn_j),
            jnp.asarray(ef_j), train=True, mutable=["batch_stats"])
    else:
        out_j = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(t2j_feat(x_t)), jnp.asarray(nn_j),
            jnp.asarray(ef_j), train=False)
    tol = dict(rtol=5e-3, atol=5e-3) if train_mode else TOL
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), **tol)


# ---------------------------------------------------------------------------
# SynPwFactorModel / SynHopFactorModel at the real config (L=30)
# ---------------------------------------------------------------------------

DIMS = [64, 64, 128, 128, 256, 256, 128, 128, 64, 64, 2]


def _emodel(cin):
    return torch.nn.Sequential(
        torch.nn.Conv2d(cin, 64, 1), torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(64, 16, 1))


def _emodel_params(m):
    return {"dense_0": conv2d_params(m[0]), "dense_1": conv2d_params(m[2])}


def test_syn_pw_factor_full_config_golden():
    ref = load_ref_trainer("train_syn_pw_factor.py")
    pkg = load_ref_mpnn()
    torch.manual_seed(102)
    rng = np.random.RandomState(103)
    L, B = 30, 3

    rmodel = pkg.factor_mpnn.factor_mpnn(2, [4, 1], DIMS, [16, 16])
    emodel_pw, emodel_high = _emodel(3), _emodel(1)
    rmodel.train()

    nn_pw_t, ef_pw_t = ref.generate_pw_factor_table(L)
    nn_hi_t, ef_hi_t, hf_t = ref.generate_high_factor_table(L, 8)
    x_t = torch.from_numpy(rng.rand(B, 2, L, 1).astype(np.float32))
    pws_t = torch.from_numpy(rng.rand(B, 4, L, 1).astype(np.float32))

    etype_pw_t = emodel_pw(ef_pw_t)
    etype_hi_t = emodel_high(ef_hi_t)
    out_t, _ = rmodel(
        x_t, [pws_t, hf_t.repeat(B, 1, 1, 1)],
        [[nn_pw_t.repeat(B, 1, 1), etype_pw_t.repeat(B, 1, 1, 1)],
         [nn_hi_t.repeat(B, 1, 1), etype_hi_t.repeat(B, 1, 1, 1)]])

    fm_p, fm_s = factor_mpnn_params(rmodel)
    params = {"fmpnn": fm_p, "emodel_pw": _emodel_params(emodel_pw),
              "emodel_high": _emodel_params(emodel_high)}
    stats = {"fmpnn": fm_s}

    nn_pw_j, ef_pw_j = pw_factor_table(L)
    nn_hi_j, ef_hi_j, _hf_j = global_factor_table(L, 8)
    model = SynPwFactorModel()
    out_j, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(x_t)), jnp.asarray(t2j_feat(pws_t)),
        jnp.asarray(nn_pw_j), jnp.asarray(ef_pw_j),
        jnp.asarray(nn_hi_j), jnp.asarray(ef_hi_j),
        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), **TOL)


def test_syn_hop_factor_full_config_golden():
    ref = load_ref_trainer("train_syn_hop_factor.py")
    pkg = load_ref_mpnn()
    torch.manual_seed(104)
    rng = np.random.RandomState(105)
    L, B, hop = 30, 3, 9

    rmodel = pkg.factor_mpnn.factor_mpnn(2, [4, hop], DIMS, [16, 16])
    emodel_pw, emodel_high = _emodel(3), _emodel(2)
    rmodel.train()

    nn_pw_t, ef_pw_t = ref.generate_pw_factor_table(L)
    nn_hi_t, ef_hi_t = ref.generate_high_factor_table(L, hop)
    x_t = torch.from_numpy(rng.rand(B, 2, L, 1).astype(np.float32))
    pws_t = torch.from_numpy(rng.rand(B, 4, L, 1).astype(np.float32))
    hops_t = torch.from_numpy(rng.rand(B, hop, L, 1).astype(np.float32))

    etype_pw_t = emodel_pw(ef_pw_t)
    etype_hi_t = emodel_high(ef_hi_t)
    out_t, _ = rmodel(
        x_t, [pws_t, hops_t],
        [[nn_pw_t.repeat(B, 1, 1), etype_pw_t.repeat(B, 1, 1, 1)],
         [nn_hi_t.repeat(B, 1, 1), etype_hi_t.repeat(B, 1, 1, 1)]])

    fm_p, fm_s = factor_mpnn_params(rmodel)
    params = {"fmpnn": fm_p, "emodel_pw": _emodel_params(emodel_pw),
              "emodel_high": _emodel_params(emodel_high)}
    stats = {"fmpnn": fm_s}

    nn_pw_j, ef_pw_j = pw_factor_table(L)
    nn_hi_j, ef_hi_j = high_factor_table(L, hop)
    model = SynHopFactorModel(hop_order=hop)
    out_j, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(t2j_feat(x_t)), jnp.asarray(t2j_feat(pws_t)),
        jnp.asarray(t2j_feat(hops_t)),
        jnp.asarray(nn_pw_j), jnp.asarray(ef_pw_j),
        jnp.asarray(nn_hi_j), jnp.asarray(ef_hi_j),
        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_j), t2j_feat(out_t), **TOL)


# ---------------------------------------------------------------------------
# LDPCModel at the real reference config, on a real 96.3.963 batch
# ---------------------------------------------------------------------------

def _real_ldpc_batch(rng, B):
    """Real alist-derived structure + synthetic channel outputs."""
    feats = []
    for i in range(B):
        y, _ = gen_sample(float(i % 5), float(i % 3), burst_prob=0.05,
                          rng=rng)
        feats.append(sample_to_features(y, float(i % 5)))
    return _stack(feats)


@pytest.mark.parametrize("train_mode", [True, False])
def test_ldpc_model_full_config_golden(train_mode):
    """The real LDPCModel class from /root/reference/train_ldpc.py:19-99
    (2, 6, 4, aggregator='max'), run under old-torch 1-node InstanceNorm
    semantics, vs fgnn_tpu's LDPCModel with transplanted weights."""
    reft = load_ref_trainer("train_ldpc.py")
    torch.manual_seed(106)
    rng = np.random.RandomState(107)
    B = 4

    ref = reft.LDPCModel(2, 6, 4, aggregator="max")
    (ref.train if train_mode else ref.eval)()

    batch = _real_ldpc_batch(rng, B)
    node_t = torch.from_numpy(
        batch["node_feature"].transpose(0, 2, 1)[..., None])   # (B,2,96,1)
    hop_t = torch.from_numpy(
        batch["hop_feature"].transpose(0, 2, 1)[..., None])    # (B,6,48,1)
    nnf_t = torch.from_numpy(batch["nn_idx_f2v"].astype(np.int64))
    nnv_t = torch.from_numpy(batch["nn_idx_v2f"].astype(np.int64))
    eff_t = torch.from_numpy(batch["efeature_f2v"].transpose(0, 3, 1, 2))
    efv_t = torch.from_numpy(batch["efeature_v2f"].transpose(0, 3, 1, 2))

    with old_torch_instance_norm(), torch.no_grad():
        logits_t, sb_t = ref(node_t, hop_t, nnf_t, nnv_t, eff_t, efv_t)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params, stats = import_ldpc_model(sd)
    model = LDPCModel()
    inputs = dict(
        node_feature=jnp.asarray(batch["node_feature"]),
        hop_feature=jnp.asarray(batch["hop_feature"]),
        nn_idx_f2v=jnp.asarray(batch["nn_idx_f2v"].astype(np.int32)),
        nn_idx_v2f=jnp.asarray(batch["nn_idx_v2f"].astype(np.int32)),
        efeature_f2v=jnp.asarray(batch["efeature_f2v"]),
        efeature_v2f=jnp.asarray(batch["efeature_v2f"]),
    )
    if train_mode:
        (logits_j, sb_j), _ = model.apply(
            {"params": params, "batch_stats": stats}, **inputs, train=True,
            mutable=["batch_stats"])
    else:
        logits_j, sb_j = model.apply(
            {"params": params, "batch_stats": stats}, **inputs, train=False)

    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(sb_j), sb_t.numpy(), **TOL)
