from .typed_mp import (
    Extension,
    aggregate,
    gather_nodes,
    typed_mp_conv,
)
from .segment import (
    segment_sum,
    segment_max,
    segment_mean,
    segment_logsumexp,
    typed_mp_conv_coo,
)

__all__ = [
    "Extension",
    "aggregate",
    "gather_nodes",
    "typed_mp_conv",
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_logsumexp",
    "typed_mp_conv_coo",
]
