"""Edge-partitioned typed message passing across a device mesh.

The reference never scales past one GPU; this is the framework's
sequence-parallelism analogue (SURVEY.md §2.6): the factor-variable
incidence EDGE LIST is sharded across devices, each device computes a
partial segment aggregation over its edge shard, and partials are combined
with XLA collectives over ICI:

  * sum / mean : psum of partials (+ psum of counts for mean)
  * max        : pmax with -inf identity for empty local segments
  * softmax    : two-phase — pmax of local maxima, then psum of shifted
                 exponentials (numerically exact logsumexp across shards)

Source features are replicated here (the reference graphs have <= 144
nodes; replication is the right trade below ~10^5 nodes).  For larger
graphs the same shard_map body extends with an all_to_all halo exchange of
boundary source features — the combine logic is unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def pad_edges(src, dst, etype, n_shards: int):
    """Pad the edge list to a multiple of n_shards with masked self-edges."""
    E = src.shape[0]
    Ep = -(-E // n_shards) * n_shards
    pad = Ep - E
    src = np.concatenate([src, np.zeros(pad, src.dtype)])
    dst = np.concatenate([dst, np.zeros(pad, dst.dtype)])
    etype = np.concatenate([etype, np.zeros((pad,) + etype.shape[1:],
                                            etype.dtype)])
    mask = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
    return src, dst, etype, mask


def partitioned_typed_mp_coo(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    etype: jax.Array,
    edge_mask: jax.Array,
    filters: jax.Array,
    nout: int,
    num_dst: int,
    mesh: Mesh,
    *,
    axis: str = "data",
    aggregator: str = "max",
    gamma: float = 3.0,
) -> jax.Array:
    """COO typed message passing with edges sharded over ``axis``.

    x (N_src, C_in) replicated; src/dst/etype/edge_mask (E,) sharded on
    their leading axis (E divisible by the axis size — use pad_edges).
    Returns (num_dst, nout) fully replicated.
    """
    T = etype.shape[-1]

    def body(x_l, src_l, dst_l, et_l, mask_l, w_l):
        h = (x_l @ w_l).reshape(-1, nout, T)
        msgs = jnp.einsum("ect,et->ec", h[src_l], et_l)
        if aggregator in ("sum", "mean"):
            msgs = jnp.where(mask_l[:, None], msgs, 0.0)
            part = jax.ops.segment_sum(msgs, dst_l, num_segments=num_dst)
            total = jax.lax.psum(part, axis)
            if aggregator == "mean":
                cnt = jax.ops.segment_sum(
                    jnp.where(mask_l, 1.0, 0.0), dst_l, num_segments=num_dst)
                cnt = jax.lax.psum(cnt, axis)
                total = total / jnp.maximum(cnt, 1.0)[:, None]
            return total
        if aggregator == "max":
            msgs = jnp.where(mask_l[:, None], msgs, _NEG)
            part = jax.ops.segment_max(msgs, dst_l, num_segments=num_dst)
            total = jax.lax.pmax(part, axis)
            return jnp.where(total <= _NEG / 2, 0.0, total)
        if aggregator == "softmax":
            msgs = jnp.where(mask_l[:, None], msgs, _NEG)
            part_max = jax.ops.segment_max(msgs, dst_l, num_segments=num_dst)
            m = jax.lax.pmax(part_max, axis)
            m_safe = jnp.where(m <= _NEG / 2, 0.0, m)
            shifted = jnp.exp(gamma * (msgs - m_safe[dst_l]))
            shifted = jnp.where(mask_l[:, None], shifted, 0.0)
            s = jax.lax.psum(
                jax.ops.segment_sum(shifted, dst_l, num_segments=num_dst),
                axis)
            return m_safe + jnp.log(jnp.maximum(s, 1e-30)) / gamma
        raise ValueError(aggregator)

    shard = P(axis)
    rep = P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, shard, shard, shard, shard, rep),
        out_specs=rep,
    )
    return fn(x, src, dst, etype, edge_mask, filters)
