"""FactorNN — the bipartite (sparse) factor-graph network.

TPU-native re-design of the reference ``FactorNN``
(/root/reference/lib/model/mpnn/factor_mpnn_sp.py:25-178): variables and
factors keep separate feature arrays; each layer computes

  nodes:   v2v(x)  + sum_j  F2V_j(factors_j)        gathered over nn_idx_f2v
  factors: f2f_j(f) +        V2F_j(nodes)           gathered over nn_idx_v2f

with NO_EXTENSION typed message passing, residual adds when the layer keeps
its width, skip links across layers, and a final per-node classifier.

Layer-module selection rule (factor_mpnn_sp.py:74-94):
  nin == nout                        -> MPConvResidual(no outer residual)
  nin, nout <= max_mpnn_dim          -> MPConv(nin -> nout)
  otherwise                          -> MPConvResidual bottleneck to nout
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops import Extension
from .base import IIDMap, IIDMapBN, IIDMapIN
from .mp_conv import MPConv, MPConvResidual
from .norm import Dense, InstanceNorm


def _make_mp(nin: int, nout: int, netype: int, gnn_immediate_dim: int,
             max_mpnn_dim: int, aggregator: str, name: str):
    if nin == nout:
        return MPConvResidual(
            nmed=gnn_immediate_dim, nedge_types=netype,
            extension=Extension.NO_EXTENSION, with_residual=False,
            aggregator=aggregator, name=name)
    if nin <= max_mpnn_dim and nout <= max_mpnn_dim:
        return MPConv(
            nout=nout, nedge_types=netype, extension=Extension.NO_EXTENSION,
            aggregator=aggregator, name=name)
    return MPConvResidual(
        nmed=gnn_immediate_dim, nedge_types=netype,
        extension=Extension.NO_EXTENSION, with_residual=False,
        aggregator=aggregator, nout=nout, name=name)


class FactorNN(nn.Module):
    """Bipartite VF/FV factor-graph network (factor_mpnn_sp.py:25-178).

    Inputs to __call__ (layout (B, N, C); the reference uses (B, C, N, 1)):
      node_feature: (B, N_vars, node_feature_dim)
      factor_features: list over factor types, (B, N_fac_j, dim_j)
      nn_idx_f2v: list, (B, N_vars, K_j) indices into factors of type j
      nn_idx_v2f: list, (B, N_fac_j, K'_j) indices into variables
      etype_f2v:  list, (B, N_vars, K_j, netype_j)
      etype_v2f:  list, (B, N_fac_j, K'_j, netype_j)
    """

    factor_feature_dims: Sequence[int]
    dim_mapping_list: Sequence[int]
    netype_list: Sequence[int]
    nclass: int = 2
    gnn_immediate_dim: int = 64
    max_mpnn_dim: int = 128
    skip_link: Optional[Dict[int, int]] = None
    aggregator: str = "max"
    ret_high: bool = False

    @nn.compact
    def __call__(self, node_feature, factor_features, nn_idx_f2v, nn_idx_v2f,
                 etype_f2v, etype_v2f, train: bool = True):
        ntypes = len(self.factor_feature_dims)
        dims = list(self.dim_mapping_list)
        skip = dict(self.skip_link or {})

        x = IIDMap(dims[0], name="node_mapping")(node_feature)
        fs = [
            IIDMapBN(dims[0], name=f"factor_mapping_{j}")(factor_features[j], train=train)
            for j in range(ntypes)
        ]

        inter: list = []
        for idx in range(len(dims) - 1):
            nin, nout = dims[idx], dims[idx + 1]
            nfeat = IIDMapIN(nout, name=f"v2v_{idx}")(x)
            nf = [
                IIDMapIN(nout, name=f"f2f_{idx}_{j}")(fs[j]) for j in range(ntypes)
            ]
            for j in range(ntypes):
                f2v = _make_mp(nin, nout, self.netype_list[j],
                               self.gnn_immediate_dim, self.max_mpnn_dim,
                               self.aggregator, name=f"f2v_{idx}_{j}")
                v2f = _make_mp(nin, nout, self.netype_list[j],
                               self.gnn_immediate_dim, self.max_mpnn_dim,
                               self.aggregator, name=f"v2f_{idx}_{j}")
                nfeat = nfeat + f2v(fs[j], nn_idx_f2v[j], etype_f2v[j], train=train)
                nf[j] = nf[j] + v2f(x, nn_idx_v2f[j], etype_v2f[j], train=train)

            if nin == nout:
                x = x + nfeat
                fs = [a + b for a, b in zip(nf, fs)]
            else:
                x = nfeat
                fs = nf

            if idx in skip:
                ox, ofs = inter[skip[idx]]
                x = x + ox
                fs = [a + b for a, b in zip(ofs, fs)]

            inter.append((x, fs))

        final_dim = self.nclass if self.nclass > 2 else 1
        h = Dense(128, name="final_conv1")(x)
        h = InstanceNorm(name="final_in")(h)
        h = nn.relu(h)
        out = Dense(final_dim, name="final_conv2")(h)

        if self.ret_high:
            return out, fs
        return out
