"""Top-level models for the three synthetic chain-MRF MAP workloads.

Each bundles the reference's separately-optimized "emodel" edge-weight MLPs
into one module/param-tree (same math, one optimizer — the reference used a
single Adam over the concatenated parameter lists anyway,
train_syn_fixed_pw_hop.py:213-215).

* :class:`SynFixedModel` — train_syn_fixed_pw_hop.py:120-175 model zoo
  ('mp_nn', 'mp_nn_comp', 'simple_gnn', 'iid') over the variable chain only.
* :class:`SynPwFactorModel` — train_syn_pw_factor.py:174-184: FactorMPNN
  with learned pairwise factors + one dummy global factor.
* :class:`SynHopFactorModel` — train_syn_hop_factor.py:169-179: FactorMPNN
  with learned pairwise + learned budget (hop) factors.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops import Extension
from .base import MLP
from .containers import IIDBlock, MPSequential
from .factor_mpnn import FactorMPNN
from .mp_conv import MPConv, MPConvResidual
from .norm import Dense

FMPNN_DIMS = (64, 64, 128, 128, 256, 256, 128, 128, 64, 64, 2)


def _fixed_stack(variant: str):
    if variant == "mp_nn":
        return [
            MPConv(64, 16, extension=Extension.ORIG_WITH_NEIGHBOR),
            MPConvResidual(64, 16), IIDBlock(128),
            MPConvResidual(64, 16), IIDBlock(256),
            MPConvResidual(64, 16), IIDBlock(128),
            MPConvResidual(64, 16), IIDBlock(64),
            MPConvResidual(64, 16), Dense(2),
        ]
    if variant == "mp_nn_comp":
        return [
            MPConv(64, 16, extension=Extension.ORIG_WITH_NEIGHBOR),
            MPConvResidual(64, 16), IIDBlock(128),
            MPConvResidual(64, 16), IIDBlock(256),
            MPConvResidual(64, 16), MPConvResidual(64, 16),
            MPConvResidual(64, 16), MPConvResidual(64, 16),
            MPConvResidual(64, 16), IIDBlock(128),
            MPConvResidual(64, 16), IIDBlock(64),
            MPConvResidual(64, 16), Dense(2),
        ]
    if variant == "simple_gnn":
        return [
            MPConv(64, 16, extension=Extension.ORIG_WITH_NEIGHBOR),
            MPConvResidual(64, 16), Dense(2),
        ]
    if variant == "iid":
        return [Dense(64), nn.relu, Dense(2)]
    raise ValueError(f"unknown variant {variant!r}")


class SynFixedModel(nn.Module):
    """Plain GNN over the variable chain (fixed potentials workload).

    __call__(node_feature (B, L, 2), nn_idx (L, K), efeature (L, K, 1))
    -> logits (B, L, 2).
    """

    variant: str = "mp_nn"
    netypes: int = 16

    @nn.compact
    def __call__(self, node_feature, nn_idx, efeature, train: bool = True):
        B = node_feature.shape[0]
        etype = MLP([64, self.netypes], name="emodel")(efeature)
        etype = jnp.broadcast_to(etype[None], (B,) + etype.shape)
        layers = _fixed_stack(self.variant)
        if self.variant == "iid":
            x = node_feature
            x = Dense(64, name="iid_0")(x)
            x = nn.relu(x)
            return Dense(2, name="iid_1")(x)
        return MPSequential(layers, name="gnn")(
            node_feature, nn_idx, etype, train=train)


class SynPwFactorModel(nn.Module):
    """FactorMPNN(2, [4, 1], FMPNN_DIMS, [16, 16]) with the chain pairwise
    factor graph and a single dummy global factor.

    __call__ inputs:
      node_feature (B, L, 2); pws (B, L, 4) pairwise factor features;
      nn_idx_pw (2L, 2), ef_pw (2L, 2, 3): the joint [vars ; pw-factors]
      table; nn_idx_high (L+1, k), ef_high (L+1, k, 1): var-KNN + dummy
      global factor.
    """

    netypes: int = 16
    dims: Sequence[int] = FMPNN_DIMS

    @nn.compact
    def __call__(self, node_feature, pws, nn_idx_pw, ef_pw, nn_idx_high,
                 ef_high, train: bool = True):
        B, L = node_feature.shape[:2]
        etype_pw = MLP([64, self.netypes], name="emodel_pw")(ef_pw)
        etype_high = MLP([64, self.netypes], name="emodel_high")(ef_high)
        etype_pw = jnp.broadcast_to(etype_pw[None], (B,) + etype_pw.shape)
        etype_high = jnp.broadcast_to(etype_high[None], (B,) + etype_high.shape)
        high_feature = jnp.zeros((B, 1, 1), node_feature.dtype)
        out, _ = FactorMPNN(
            factor_feature_dims=(4, 1),
            dim_mapping_list=tuple(self.dims),
            netype_list=(self.netypes, self.netypes),
            name="fmpnn",
        )(node_feature, [pws, high_feature],
          [(nn_idx_pw, etype_pw), (nn_idx_high, etype_high)], train=train)
        return out  # (B, L, 2) logits


class SynHopFactorModel(nn.Module):
    """FactorMPNN(2, [4, hop_order], FMPNN_DIMS, [16, 16]) with learned
    pairwise + learned hop factors on circular joint tables."""

    hop_order: int = 9
    netypes: int = 16
    dims: Sequence[int] = FMPNN_DIMS

    @nn.compact
    def __call__(self, node_feature, pws, hops, nn_idx_pw, ef_pw,
                 nn_idx_high, ef_high, train: bool = True):
        B = node_feature.shape[0]
        etype_pw = MLP([64, self.netypes], name="emodel_pw")(ef_pw)
        etype_high = MLP([64, self.netypes], name="emodel_high")(ef_high)
        etype_pw = jnp.broadcast_to(etype_pw[None], (B,) + etype_pw.shape)
        etype_high = jnp.broadcast_to(etype_high[None], (B,) + etype_high.shape)
        out, _ = FactorMPNN(
            factor_feature_dims=(4, self.hop_order),
            dim_mapping_list=tuple(self.dims),
            netype_list=(self.netypes, self.netypes),
            name="fmpnn",
        )(node_feature, [pws, hops],
          [(nn_idx_pw, etype_pw), (nn_idx_high, etype_high)], train=train)
        return out


class SynHopFactorModelCoo(nn.Module):
    """Flat disjoint-union variant of :class:`SynHopFactorModel`.

    Heterogeneous chain lengths batch WITHOUT padding through the
    FactorGraph COO IR (fgnn_tpu.graph.build_joint_coo); the parameter
    tree is IDENTICAL to SynHopFactorModel, so variables transplant both
    ways (asserted in tests/test_coo_batching.py).

    __call__ inputs (flat, vars-first union numbering):
      node_feature (NV, 2); pws (NF_pw, 4); hops (NF_hi, hop_order);
      coo_pw / coo_high: CooGraph over each type's joint numbering;
      ef_pw (E_pw, 3) / ef_high (E_hi, 2): per-edge features.
    Returns flat logits (NV, 2).
    """

    hop_order: int = 9
    netypes: int = 16
    dims: Sequence[int] = FMPNN_DIMS

    @nn.compact
    def __call__(self, node_feature, pws, hops, coo_pw, ef_pw,
                 coo_high, ef_high, train: bool = True):
        etype_pw = MLP([64, self.netypes], name="emodel_pw")(ef_pw)
        etype_high = MLP([64, self.netypes], name="emodel_high")(ef_high)
        out, _ = FactorMPNN(
            factor_feature_dims=(4, self.hop_order),
            dim_mapping_list=tuple(self.dims),
            netype_list=(self.netypes, self.netypes),
            name="fmpnn",
        )(node_feature, [pws, hops],
          [(coo_pw, etype_pw), (coo_high, etype_high)], train=train)
        return out
