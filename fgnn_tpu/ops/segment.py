"""Segment (COO edge-list) aggregation ops.

The dense gather-table form in :mod:`typed_mp` covers every reference
workload (all reference graphs are padded ``(N, K)`` tables,
e.g. /root/reference/lib/data/ldpc_dataset.py:20-53).  The COO form here is
the generalization used for ragged factor degrees and for edge-partitioned
multi-device aggregation (see fgnn_tpu.parallel.edge_partition): edges are
a flat list ``(src[e], dst[e])`` with per-edge type weights, and messages
are combined into destinations with masked segment reductions that stay
static-shaped under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

_NEG_INF = -1e30


class CooGraph(struct.PyTreeNode):
    """Flat COO graph batch — the device-side form of one or more
    :class:`fgnn_tpu.graph.FactorGraph`s after disjoint union.

    Passed to MPConv/FactorMPNN IN PLACE of a dense ``nn_idx`` table: the
    modules dispatch on the type and run the segment kernels over the flat
    node set, so heterogeneous graphs batch without padding to a common
    (N, K) shape.

    src/dst:   (E,) int32 edge endpoints into the flat joint node set
    edge_mask: (E,) bool (False = padding edge)
    num_nodes: static flat node count (== num segments of the aggregation)
    seg:       (num_nodes,) int32 sample id per node (for per-sample
               InstanceNorm under disjoint-union batching); -1 for padding
    num_segments: static number of samples in the union
    """

    src: jax.Array
    dst: jax.Array
    edge_mask: Optional[jax.Array] = None
    num_nodes: int = struct.field(pytree_node=False, default=0)
    seg: Optional[jax.Array] = None
    num_segments: int = struct.field(pytree_node=False, default=1)


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], data.dtype), segment_ids, num_segments=num_segments
    )
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_logsumexp(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    gamma: float = 3.0,
) -> jax.Array:
    """(1/gamma) * logsumexp(gamma * x) per segment — numerically shifted.

    Matches the reference's softmax aggregator (mp_nn.py:79-85) on COO data.
    """
    m = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    shifted = jnp.exp(gamma * (data - m[segment_ids]))
    s = jax.ops.segment_sum(shifted, segment_ids, num_segments=num_segments)
    return m + (1.0 / gamma) * jnp.log(jnp.maximum(s, 1e-30))


def typed_mp_conv_coo(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    etype: jax.Array,
    filters: jax.Array,
    nout: int,
    num_dst: int,
    *,
    aggregator: str = "max",
    gamma: float = 3.0,
    bias: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    extension: str = "none",
) -> jax.Array:
    """COO-form typed message passing (single flat graph).

    x:       (N_src, C_in)  (extensions require N_src == num_dst node set)
    src/dst: (E,) int edge endpoints
    etype:   (E, T)
    filters: (C_in, nout*T), column layout c_out * T + t; (2*C_in, nout*T)
             for the extensions (reference mp_nn.py:136-159)
    edge_mask: (E,) optional bool; masked edges are dropped (identity of the
               aggregation: -inf for max, 0 for sum/mean).
    extension: 'none' | 'diff' ([x_i ; x_i - x_j]) | 'neighbor'
               ([x_i ; x_j]) — same factorization as the dense path
               (typed_mp.typed_mp_conv): matmuls run per NODE, the edge
               stage is gather + add.
    returns  (num_dst, nout)
    """
    T = etype.shape[-1]
    if extension == "none":
        h = (x @ filters).reshape(-1, nout, T)        # (N_src, nout, T)
        he = h[src]                                    # (E, nout, T)
    elif extension in ("diff", "neighbor"):
        cin = x.shape[-1]
        w_self, w_nbr = filters[:cin], filters[cin:]
        if extension == "diff":
            a = x @ (w_self + w_nbr)
            sign = -1.0
        else:
            a = x @ w_self
            sign = 1.0
        b = x @ w_nbr
        he = (a[dst] + sign * b[src]).reshape(-1, nout, T)
    else:
        raise ValueError(f"unknown extension {extension!r}")
    msgs = jnp.einsum("ect,et->ec", he, etype)         # (E, nout)

    if aggregator == "max":
        if edge_mask is not None:
            msgs = jnp.where(edge_mask[:, None], msgs, _NEG_INF)
        out = segment_max(msgs, dst, num_dst)
        out = jnp.where(out <= _NEG_INF / 2, 0.0, out)
    elif aggregator == "softmax":
        if edge_mask is not None:
            msgs = jnp.where(edge_mask[:, None], msgs, _NEG_INF)
        out = segment_logsumexp(msgs, dst, num_dst, gamma)
    elif aggregator == "mean":
        if edge_mask is not None:
            # denominator counts VALID edges only (padding edges contribute
            # neither to the sum nor the count), matching
            # parallel/edge_partition.py and parallel/halo.py
            msgs = jnp.where(edge_mask[:, None], msgs, 0.0)
            s = segment_sum(msgs, dst, num_dst)
            cnt = segment_sum(edge_mask.astype(msgs.dtype), dst, num_dst)
            out = s / jnp.maximum(cnt, 1.0)[:, None]
        else:
            out = segment_mean(msgs, dst, num_dst)
    elif aggregator == "sum":
        if edge_mask is not None:
            msgs = jnp.where(edge_mask[:, None], msgs, 0.0)
        out = segment_sum(msgs, dst, num_dst)
    else:
        raise ValueError(f"unknown aggregator {aggregator!r}")

    if bias is not None:
        out = out + bias
    return out
