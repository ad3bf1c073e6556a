"""Import reference PyTorch checkpoints into fgnn_tpu parameter trees.

Users of the reference repo can move trained models over: this maps the
tensors of a reference ``state_dict`` (as numpy arrays; load the torch
checkpoint with ``torch.load(...)['model_state_dict']`` and call
``{k: v.numpy() for k, v in sd.items()}``) onto fgnn_tpu's flax params +
batch_stats, converting layouts:

  * Conv2d 1x1 ``(out, in, 1, 1)``  -> Dense kernel ``(in, out)``
  * Linear ``(out, in)``            -> Dense kernel ``(in, out)``
  * mp_conv_v2 ``filters``          -> identical (C_in, C_out*T) layout
  * BatchNorm2d/1d weight/bias/running_mean/running_var ->
    scale/bias + batch_stats mean/var

Covered: the reference ``FactorNN`` (factor_mpnn_sp.py:25-113) under any
prefix, ``factor_mpnn`` layers, the emodel MLPs, and the full
``LDPCModel`` of train_ldpc.py:19-65.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"][:, :, 0, 0].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _linear(sd: StateDict, prefix: str) -> Dict[str, Array]:
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _bn(sd: StateDict, prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _mp_conv(sd: StateDict, prefix: str):
    params = {"filters": np.asarray(sd[f"{prefix}.filters"])}
    stats = {}
    if f"{prefix}.bias" in sd:
        params["bias"] = np.asarray(sd[f"{prefix}.bias"])
    if f"{prefix}.bn.weight" in sd:
        params["bn"], stats["bn"] = _bn(sd, f"{prefix}.bn")
    return params, stats


def _mp_conv_residual(sd: StateDict, prefix: str):
    mp_p, mp_s = _mp_conv(sd, f"{prefix}.mp_conv")
    bn1_p, bn1_s = _bn(sd, f"{prefix}.conv1.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.conv2.1")
    params = {"conv1": _conv(sd, f"{prefix}.conv1.0"), "bn1": bn1_p,
              "mp_conv": mp_p, "conv2": _conv(sd, f"{prefix}.conv2.0"),
              "bn2": bn2_p}
    stats = {"bn1": bn1_s, "mp_conv": mp_s, "bn2": bn2_s}
    return params, stats


def _mp_module(sd: StateDict, prefix: str):
    """Dispatch mp_conv_v2 vs mp_conv_residual vs pointwise by key shape."""
    if f"{prefix}.filters" in sd:
        return _mp_conv(sd, prefix)
    if f"{prefix}.mp_conv.filters" in sd:
        return _mp_conv_residual(sd, prefix)
    # pointwise fallback (Sequential Conv/IN/ReLU)
    return {"conv": _conv(sd, f"{prefix}.0")}, {}


def import_factor_nn(sd: StateDict, prefix: str = "",
                     n_factor_types: int = 2, n_layers: int = 8):
    """Reference FactorNN state_dict -> (params, batch_stats) for
    fgnn_tpu.models.FactorNN."""
    pre = f"{prefix}." if prefix else ""
    params: Dict = {}
    stats: Dict = {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    put("node_mapping",
        ({"conv": _conv(sd, f"{pre}node_mapping_module.main.0")}, {}))
    for j in range(n_factor_types):
        bn_p, bn_s = _bn(sd, f"{pre}factor_mapping_modules_{j}.main.1")
        put(f"factor_mapping_{j}",
            ({"conv": _conv(sd, f"{pre}factor_mapping_modules_{j}.main.0"),
              "bn": bn_p}, {"bn": bn_s}))
    for i in range(n_layers):
        put(f"v2v_{i}", ({"conv": _conv(sd, f"{pre}v2v_{i}.main.0")}, {}))
        for j in range(n_factor_types):
            put(f"f2f_{i}_{j}",
                ({"conv": _conv(sd, f"{pre}f2f_{i}_{j}.main.0")}, {}))
            put(f"f2v_{i}_{j}", _mp_module(sd, f"{pre}f2v_{i}_{j}"))
            put(f"v2f_{i}_{j}", _mp_module(sd, f"{pre}v2f_{i}_{j}"))
    params["final_conv1"] = _conv(sd, f"{pre}final_classifier.0")
    params["final_conv2"] = _conv(sd, f"{pre}final_classifier.3")
    return params, stats


def import_mlp(sd: StateDict, prefix: str, layer_ids=(0, 2)):
    """Sequential Conv/ReLU/Conv emodel -> fgnn_tpu.models.MLP params."""
    return {f"dense_{i}": _conv(sd, f"{prefix}.{lid}")
            for i, lid in enumerate(layer_ids)}


def import_ldpc_model(sd: StateDict):
    """Full reference LDPCModel (train_ldpc.py:19-65) state_dict ->
    (params, batch_stats) for fgnn_tpu.models.LDPCModel."""
    main_p, main_s = import_factor_nn(sd, "main")
    bn_p, bn_s = _bn(sd, "nhop_regressor.1")
    params = {
        "main": main_p,
        "emodel_f2v": import_mlp(sd, "emodel_f2v"),
        "emodel_v2f": import_mlp(sd, "emodel_v2f"),
        "nhop_regressor": {
            "fc1": _linear(sd, "nhop_regressor.0"),
            "bn": bn_p,
            "fc2": _linear(sd, "nhop_regressor.3"),
            "fc3": _linear(sd, "nhop_regressor.5"),
        },
    }
    stats = {"main": main_s, "nhop_regressor": {"bn": bn_s}}
    return params, stats
