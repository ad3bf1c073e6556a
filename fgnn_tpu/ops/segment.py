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

_NEG_INF = -1e30


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
) -> jax.Array:
    """COO-form NO_EXTENSION typed message passing (single graph).

    x:       (N_src, C_in)
    src/dst: (E,) int edge endpoints
    etype:   (E, T)
    filters: (C_in, nout*T), column layout c_out * T + t
    edge_mask: (E,) optional bool; masked edges are dropped (identity of the
               aggregation: -inf for max, 0 for sum/mean).
    returns  (num_dst, nout)
    """
    T = etype.shape[-1]
    h = (x @ filters).reshape(-1, nout, T)            # (N_src, nout, T)
    msgs = jnp.einsum("ect,et->ec", h[src], etype)    # (E, nout)

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
            msgs = jnp.where(edge_mask[:, None], msgs, 0.0)
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
