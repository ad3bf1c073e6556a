"""Helpers to load the REFERENCE torch modules (read-only) for golden tests.

We import /root/reference/lib/model/mpnn as a synthetic package so that the
reference's ``lib/__init__`` (which needs the compiled MNC extension and the
ad3 pip package) is never touched.  The reference code itself is never
copied — it runs as the oracle our TPU modules are compared against.
"""

import importlib.util
import sys
import types

import numpy as np

REF_MPNN = "/root/reference/lib/model/mpnn"


def load_ref_mpnn():
    """Import the reference mpnn package under the alias ``refmpnn``."""
    if "refmpnn" in sys.modules:
        return sys.modules["refmpnn"]
    pkg = types.ModuleType("refmpnn")
    pkg.__path__ = [REF_MPNN]
    pkg.__package__ = "refmpnn"
    sys.modules["refmpnn"] = pkg
    for mod in ["base_model", "mp_nn", "mp_nn_residual", "sequential",
                "parallel_net", "pooling", "ensemble", "identity",
                "factor_mpnn", "factor_mpnn_sp"]:
        spec = importlib.util.spec_from_file_location(
            f"refmpnn.{mod}", f"{REF_MPNN}/{mod}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refmpnn.{mod}"] = m
        spec.loader.exec_module(m)
        setattr(pkg, mod, m)
    return pkg


# ---------------------------------------------------------------------------
# torch <-> jax tensor layout conversion
# ---------------------------------------------------------------------------

def t2j_feat(x):
    """torch (B, C, N, 1) -> jax (B, N, C)."""
    return np.ascontiguousarray(x.detach().numpy().copy()[:, :, :, 0].transpose(0, 2, 1))


def j2t_feat(x):
    """numpy (B, N, C) -> torch (B, C, N, 1)."""
    import torch
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)[..., None]))


def t2j_etype(e):
    """torch (B, T, N, K) -> jax (B, N, K, T)."""
    return np.ascontiguousarray(e.detach().numpy().copy().transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# torch -> flax parameter transfer
# ---------------------------------------------------------------------------

def conv2d_params(conv):
    """torch Conv2d 1x1 -> {'kernel': (in, out), 'bias': (out,)}."""
    w = conv.weight.detach().numpy().copy()[:, :, 0, 0].T
    p = {"kernel": w}
    if conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy().copy()
    return p


def linear_params(lin):
    p = {"kernel": lin.weight.detach().numpy().copy().T}
    if lin.bias is not None:
        p["bias"] = lin.bias.detach().numpy().copy()
    return p


def bn_params(bn):
    return (
        {"scale": bn.weight.detach().numpy().copy(), "bias": bn.bias.detach().numpy().copy()},
        {"mean": bn.running_mean.detach().numpy().copy(), "var": bn.running_var.detach().numpy().copy()},
    )


def mp_conv_params(ref):
    """reference mp_conv_v2 -> flax MPConv params/batch_stats dicts."""
    params = {"filters": ref.filters.detach().numpy().copy()}
    stats = {}
    if ref.bias is not None:
        params["bias"] = ref.bias.detach().numpy().copy()
    if ref.bn is not None:
        params["bn"], stats["bn"] = bn_params(ref.bn)
    return params, stats


def mp_conv_residual_params(ref):
    """reference mp_conv_residual -> flax MPConvResidual params/batch_stats."""
    mp_p, mp_s = mp_conv_params(ref.mp_conv)
    params = {
        "conv1": conv2d_params(ref.conv1[0]),
        "bn1": bn_params(ref.conv1[1])[0],
        "mp_conv": mp_p,
        "conv2": conv2d_params(ref.conv2[0]),
        "bn2": bn_params(ref.conv2[1])[0],
    }
    stats = {
        "bn1": bn_params(ref.conv1[1])[1],
        "mp_conv": mp_s,
        "bn2": bn_params(ref.conv2[1])[1],
    }
    return params, stats


def iid_map_params(ref):
    """iid_mapping -> IIDMap."""
    return {"conv": conv2d_params(ref.main[0])}, {}


def iid_map_bn_params(ref):
    """iid_mapping_bn -> IIDMapBN."""
    p, s = bn_params(ref.main[1])
    return {"conv": conv2d_params(ref.main[0]), "bn": p}, {"bn": s}


def iid_map_in_params(ref):
    """iid_mapping_in -> IIDMapIN (InstanceNorm has no params)."""
    return {"conv": conv2d_params(ref.main[0])}, {}


def factor_nn_params(ref):
    """reference FactorNN -> flax FactorNN params/batch_stats dicts."""
    load_ref_mpnn()
    from refmpnn.mp_nn import mp_conv_v2
    from refmpnn.mp_nn_residual import mp_conv_residual

    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    put("node_mapping", iid_map_params(ref.node_mapping_module))
    for j, m in enumerate(ref.factor_mapping_modules):
        put(f"factor_mapping_{j}", iid_map_bn_params(m))
    nlayers = len(ref.v2f_modules)
    for idx in range(nlayers):
        put(f"v2v_{idx}", iid_map_in_params(ref.v2v_modules[idx]))
        for j in range(len(ref.f2v_modules[idx])):
            put(f"f2f_{idx}_{j}", iid_map_in_params(ref.f2f_modules[idx][j]))
            for tag, mod in (("f2v", ref.f2v_modules[idx][j]),
                             ("v2f", ref.v2f_modules[idx][j])):
                if isinstance(mod, mp_conv_residual):
                    put(f"{tag}_{idx}_{j}", mp_conv_residual_params(mod))
                elif isinstance(mod, mp_conv_v2):
                    put(f"{tag}_{idx}_{j}", mp_conv_params(mod))
                else:
                    raise TypeError(type(mod))
    params["final_conv1"] = conv2d_params(ref.final_classifier[0])
    params["final_conv2"] = conv2d_params(ref.final_classifier[3])
    return params, stats


def factor_mpnn_params(ref):
    """reference factor_mpnn -> flax FactorMPNN params/batch_stats dicts."""
    load_ref_mpnn()
    import torch
    from refmpnn.mp_nn import mp_conv_v2
    from refmpnn.mp_nn_residual import mp_conv_residual

    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    for i, m in enumerate(ref.mapping_modules):
        put(f"mapping_{i}", iid_map_params(m))
    nlayers = len(ref.mp_nn_modules)
    for midx in range(nlayers):
        for jdx, mod in enumerate(ref.mp_nn_modules[midx]):
            name = f"mp_nn_{midx}_{jdx}"
            if isinstance(mod, mp_conv_residual):
                put(name, mp_conv_residual_params(mod))
            elif isinstance(mod, mp_conv_v2):
                put(name, mp_conv_params(mod))
            elif isinstance(mod, torch.nn.Sequential):
                put(name, ({"conv": conv2d_params(mod[0])}, {}))
            else:
                raise TypeError(type(mod))
        merge = ref.mp_merge_modules[midx]
        if midx < nlayers - 1:
            put(f"merge_{midx}", iid_map_bn_params(merge))
        else:
            bn_p, bn_s = bn_params(merge[1])
            put(f"merge_{midx}", (
                {"conv1": conv2d_params(merge[0]), "bn": bn_p,
                 "conv2": conv2d_params(merge[3]),
                 "conv3": conv2d_params(merge[5])},
                {"bn": bn_s},
            ))
    return params, stats
