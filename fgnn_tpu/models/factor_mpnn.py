"""FactorMPNN — the concat ("joint graph") factor-graph network.

TPU-native re-design of the reference ``factor_mpnn``
(/root/reference/lib/model/mpnn/factor_mpnn.py:8-133): per layer and per
factor type, node features and that type's factor features are concatenated
along the node axis into one joint [variables ; factors] graph, a single
shared message-passing conv runs over it, the result is split back, and the
per-type node features are merged with a per-node merge MLP.  Factor
features are carried forward per type; dict skip links add earlier layers.

Layer-module selection (factor_mpnn.py:49-70, note max_mpnn_dim default 64):
  nin == nout                -> MPConvResidual (max agg, ORIG_WITH_DIFF)
  nin, nout <= max_mpnn_dim  -> MPConv (softmax agg, ORIG_WITH_DIFF)
  otherwise                  -> pointwise Dense+InstanceNorm+ReLU (no MP)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .base import IIDMap, IIDMapBN
from .mp_conv import MPConv, MPConvResidual
from .norm import BatchNorm, Dense, InstanceNorm, leaky_relu


class _PointwiseFallback(nn.Module):
    """Dense + InstanceNorm + ReLU — the no-message-passing branch
    (factor_mpnn.py:63-66).  ``seg``/``num_segments`` route the per-sample
    InstanceNorm statistics under flat disjoint-union batching."""

    features: int

    @nn.compact
    def __call__(self, x, seg=None, num_segments: int = 1):
        x = Dense(self.features, name="conv")(x)
        x = InstanceNorm(name="in")(x, seg=seg, num_segments=num_segments)
        return nn.relu(x)


class _FinalMerge(nn.Module):
    """Last-layer merge head (factor_mpnn.py:74-82):
    Dense(->256)+BN+LeakyReLU -> Dense(256)+LeakyReLU -> Dense(->nout)."""

    nout: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Dense(256, name="conv1")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        x = leaky_relu(x)
        x = Dense(256, name="conv2")(x)
        x = leaky_relu(x)
        return Dense(self.nout, name="conv3")(x)


class FactorMPNN(nn.Module):
    """Concat-formulation factor GNN (factor_mpnn.py:8-133).

    __call__ inputs, layout (B, N, C):
      node_features:   (B, N_vars, node_dim)
      factor_features: list over types, (B, N_fac_j, dim_j)
      graph_structures: list over types of (nn_idx, etype) for the JOINT
        [vars ; factors_j] graph — nn_idx (B, N_vars+N_fac_j, K) (or 2D
        shared), etype (B, N_vars+N_fac_j, K, netype_j).

    FLAT (disjoint-union) mode: node_features (N_vars_flat, C), factor
    features (N_fac_flat_j, C), and each graph structure =
    (CooGraph over the joint [all vars ; all factors_j] numbering,
    etype (E_j, netype_j)).  Same parameters, heterogeneous graph sizes
    batch without padding (fgnn_tpu.graph.FactorGraph is the builder).

    Returns (node_logits, per-type factor features), like the reference.
    """

    factor_feature_dims: Sequence[int]
    dim_mapping_list: Sequence[int]
    netype_list: Sequence[int]
    gnn_immediate_dim: int = 64
    max_mpnn_dim: int = 64
    skip_link: Optional[Dict[int, int]] = None

    @nn.compact
    def __call__(self, node_features, factor_features, graph_structures,
                 train: bool = True):
        ntypes = len(self.factor_feature_dims)
        dims = list(self.dim_mapping_list)
        skip = dict(self.skip_link or {})
        nnode = node_features.shape[-2]

        x = IIDMap(dims[0], name="mapping_0")(node_features)
        fs = [
            IIDMap(dims[0], name=f"mapping_{j + 1}")(factor_features[j])
            for j in range(ntypes)
        ]

        inter: list = []
        for midx in range(len(dims) - 1):
            nin, nout = dims[midx], dims[midx + 1]
            cn, cf = [], []
            for jdx in range(ntypes):
                joint = jnp.concatenate([x, fs[jdx]], axis=-2)
                nn_idx, etype = graph_structures[jdx]
                name = f"mp_nn_{midx}_{jdx}"
                if nin == nout:
                    mod = MPConvResidual(
                        nmed=self.gnn_immediate_dim,
                        nedge_types=self.netype_list[jdx], name=name)
                    joint = mod(joint, nn_idx, etype, train=train)
                elif nin <= self.max_mpnn_dim and nout <= self.max_mpnn_dim:
                    mod = MPConv(
                        nout=nout, nedge_types=self.netype_list[jdx], name=name)
                    joint = mod(joint, nn_idx, etype, train=train)
                else:
                    from ..ops.segment import CooGraph

                    seg = (nn_idx.seg if isinstance(nn_idx, CooGraph)
                           else None)
                    nseg = (nn_idx.num_segments
                            if isinstance(nn_idx, CooGraph) else 1)
                    joint = _PointwiseFallback(nout, name=name)(
                        joint, seg=seg, num_segments=nseg)
                cn.append(joint[..., :nnode, :])
                cf.append(joint[..., nnode:, :])

            merged = jnp.concatenate(cn, axis=-1)
            if midx < len(dims) - 2:
                x = IIDMapBN(nout, name=f"merge_{midx}")(merged, train=train)
            else:
                x = _FinalMerge(nout, name=f"merge_{midx}")(merged, train=train)
            fs = cf

            if midx in skip:
                ox, ofs = inter[skip[midx]]
                x = x + ox
                fs = [a + b for a, b in zip(fs, ofs)]
            inter.append((x, fs))

        return x, fs
