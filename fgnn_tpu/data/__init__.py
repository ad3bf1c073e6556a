from .alist import AlistMatrix, read_alist, read_mod2mat, default_paths
from .ldpc_channel import encode, channel, posteriors, snr_amplitude
from .bp_ref import BPGraph, bp_decode, decode_posteriors
from .ldpc_graph import LDPCStructure, default_structure
from .ldpc_datasets import (
    ContinuousCodesSP,
    ContinuousCodesJoint,
    Codes,
    decode_graph,
    gen_sample,
    generate_eval_set,
    sample_to_features,
)
from .rpgm_oracle import (
    map_chain_budget,
    brute_force_chain_budget,
    lp_relaxation_chain_budget,
)
from .rpgm import (
    RandomPGM,
    RandomPGMNoHop,
    RandomPGMPw,
    RandomPGMPwNoHop,
    BucketedHopData,
    MixedLengthHopData,
    RandomPGMHop,
    batches,
)
from .tables import (
    chain_knn_table,
    pw_factor_table,
    high_factor_table,
    global_factor_table,
)
from .loader import Prefetcher, prefetch, device_prefetch, PoolBatcher
from . import ldpc_cpp

__all__ = [
    "AlistMatrix", "read_alist", "read_mod2mat", "default_paths",
    "encode", "channel", "posteriors", "snr_amplitude",
    "BPGraph", "bp_decode", "decode_posteriors",
    "LDPCStructure", "default_structure",
    "ContinuousCodesSP", "ContinuousCodesJoint", "Codes", "decode_graph", "gen_sample",
    "generate_eval_set", "sample_to_features",
    "map_chain_budget", "brute_force_chain_budget",
    "lp_relaxation_chain_budget",
    "RandomPGM", "RandomPGMNoHop", "RandomPGMPw", "RandomPGMPwNoHop",
    "BucketedHopData", "MixedLengthHopData", "RandomPGMHop", "batches",
    "chain_knn_table", "pw_factor_table", "high_factor_table",
    "global_factor_table",
    "Prefetcher", "prefetch", "device_prefetch", "PoolBatcher",
    "ldpc_cpp",
]
