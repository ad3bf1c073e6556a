from .norm import BatchNorm, Dense, InstanceNorm, leaky_relu
from .base import (
    IIDMap,
    IIDMapBN,
    IIDMapIN,
    MLP,
    MaxPoolNodes,
    Flatten,
    Identity,
    MessagePassing,
)
from .mp_conv import MPConv, MPConvResidual, GConvResidual
from .containers import (
    IIDBlock,
    MPSequential,
    ParallelNet,
    MPEnsemble,
    GlobalPooling,
)
from .factor_nn import FactorNN
from .factor_mpnn import FactorMPNN
from .ldpc_model import LDPCModel, SigmaBRegressor
from .synthetic import (
    SynFixedModel,
    SynPwFactorModel,
    SynHopFactorModel,
    SynHopFactorModelCoo,
)
from .knn import pairwise_distance, knn_graph, get_nn_node_feature, get_edge_feature

__all__ = [
    "BatchNorm", "Dense", "InstanceNorm", "leaky_relu",
    "IIDMap", "IIDMapBN", "IIDMapIN", "MLP", "MaxPoolNodes", "Flatten",
    "Identity", "MessagePassing",
    "MPConv", "MPConvResidual", "GConvResidual",
    "IIDBlock", "MPSequential", "ParallelNet", "MPEnsemble", "GlobalPooling",
    "FactorNN", "FactorMPNN", "LDPCModel", "SigmaBRegressor",
    "SynFixedModel", "SynPwFactorModel", "SynHopFactorModel",
    "SynHopFactorModelCoo",
    "pairwise_distance", "knn_graph", "get_nn_node_feature", "get_edge_feature",
]
