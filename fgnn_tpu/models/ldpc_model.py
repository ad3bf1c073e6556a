"""LDPCModel — neural decoder for the MacKay 96.3.963 code.

Re-design of the reference ``LDPCModel`` (/root/reference/train_ldpc.py:19-99):
a bipartite FactorNN over 96 variables / 48 check factors, plus a SECOND
factor type with a single global factor connected to all 96 variables whose
final feature feeds a burst-noise-level (sigma_b) regressor.  Edge weights
come from two small "emodel" MLPs applied to 7-dim per-edge features.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .base import MLP
from .factor_nn import FactorNN
from .norm import BatchNorm, Dense


class SigmaBRegressor(nn.Module):
    """nhop_regressor (train_ldpc.py:59-65): Linear(64->128)+BN1d+ReLU ->
    Linear(128->128)+ReLU -> Linear(128->1)+ReLU on (B, 64)."""

    @nn.compact
    def __call__(self, h, train: bool = True):
        h = Dense(128, name="fc1")(h)
        h = BatchNorm(name="bn")(h, use_running_average=not train)
        h = nn.relu(h)
        h = Dense(128, name="fc2")(h)
        h = nn.relu(h)
        h = Dense(1, name="fc3")(h)
        return nn.relu(h)


class LDPCModel(nn.Module):
    """Full LDPC decoder model (train_ldpc.py:19-99), layout (B, N, C).

    __call__ inputs:
      node_feature:  (B, 96, 2)  — [noisy signal, snr_db]
      hop_feature:   (B, 48, hop_order) — per-check gathered signals
      nn_idx_f2v:    (B, 96, 3) check indices per variable
      nn_idx_v2f:    (B, 48, 6) variable indices per check
      efeature_f2v:  (B, 96, 3, 7)
      efeature_v2f:  (B, 48, 6, 7)
    Returns (logits over the first 48 info bits (B, 48), sigma_b_pred (B, 1)).
    """

    hop_order: int = 6
    nedge_types: int = 4
    n_code_bits: int = 96
    n_info_bits: int = 48
    with_residual: bool = True
    aggregator: str = "max"
    # architecture knobs (defaults = the reference configuration,
    # train_ldpc.py:23-30); shrink for smoke tests
    dim_mapping_list: tuple = (64, 64, 64, 128, 256, 256, 128, 64, 64)
    skip_link: Any = None  # default {4: 3, 5: 2, 7: 0}

    @nn.compact
    def __call__(self, node_feature, hop_feature, nn_idx_f2v, nn_idx_v2f,
                 efeature_f2v, efeature_v2f, train: bool = True):
        B = node_feature.shape[0]
        N = self.n_code_bits

        # Edge-weight MLPs: Conv(7->64)+ReLU+Conv(64->nedge_types)
        # (train_ldpc.py:32-38), applied per edge.
        etype_f2v = MLP([64, self.nedge_types], name="emodel_f2v")(efeature_f2v)
        etype_v2f = MLP([64, self.nedge_types], name="emodel_v2f")(efeature_v2f)

        # Global factor (2nd type): one factor node whose feature vector is
        # the raw channel-0 signal (train_ldpc.py:40-55, 71-74); stop-grad
        # mirrors the reference's torch.no_grad() view.
        sig = jax.lax.stop_gradient(node_feature[..., 0])
        gfac_feature = sig.reshape(B, 1, N)  # (B, 1 factor, 96 channels)

        # numpy (not jnp): these tables are trace-time CONSTANTS, which lets
        # typed_mp_conv's trivial-gather shortcuts see their values (the f2v
        # side is a broadcast from one source row, the v2f side an identity
        # reshape) instead of emitting one-hot gather matmuls per layer.
        hnn_idx_f2v = np.zeros((N, 1), np.int32)          # each var sees factor 0
        hnn_idx_v2f = np.arange(N, dtype=np.int32).reshape(1, N)  # factor sees all vars
        hetype_f2v = np.ones((B, N, 1, 1), np.float32)
        hetype_v2f = np.ones((B, 1, N, 1), np.float32)

        skip = self.skip_link if self.skip_link is not None else {4: 3, 5: 2, 7: 0}
        res, fs = FactorNN(
            factor_feature_dims=(self.hop_order, N),
            dim_mapping_list=tuple(self.dim_mapping_list),
            netype_list=(self.nedge_types, 1),
            nclass=2,
            skip_link=skip,
            ret_high=True,
            aggregator=self.aggregator,
            name="main",
        )(
            node_feature,
            [hop_feature, gfac_feature],
            [nn_idx_f2v, hnn_idx_f2v],
            [nn_idx_v2f, hnn_idx_v2f],
            [etype_f2v, hetype_f2v],
            [etype_v2f, hetype_v2f],
            train=train,
        )

        if self.with_residual:
            res = res + node_feature[..., :1]  # add channel-0 input (train_ldpc.py:86-87)
        logits = res[:, : self.n_info_bits, 0]

        ghop = fs[1].reshape(B, -1)  # (B, 64) final global-factor feature
        sigma_b_pred = SigmaBRegressor(name="nhop_regressor")(ghop, train=train)
        return logits, sigma_b_pred
