"""Halo-exchange edge-partitioned typed message passing.

This is the large-graph scaling mode promised by SURVEY.md §2.6/§7.5 — the
framework's sequence-parallelism analogue.  Where
:func:`fgnn_tpu.parallel.edge_partition.partitioned_typed_mp_coo` replicates
source features on every device (the right trade for the reference's <=144
node graphs), this module shards BOTH the edge list and the source feature
rows across the mesh and exchanges only the boundary ("halo") rows that
cross a partition, over ICI, with one ``all_to_all``.

Partitioning strategy (host-side, static per graph structure):

  * destination nodes are split into contiguous blocks of ``Nd`` rows, one
    block per device; every edge lives on the device that owns its
    destination, so EVERY segment reduction is purely local — no cross-
    device combine of max/logsumexp partials is needed at all;
  * source nodes are split into contiguous blocks of ``Ns`` rows; for each
    (owner ``p`` -> consumer ``d``) pair the plan records which of ``p``'s
    rows ``d``'s edges reference.  All pair lists are padded to the same
    halo width ``H`` so the exchange is one static-shape
    ``all_to_all((D, H, C))``;
  * each device's edges are split into a LOCAL-source list and a
    REMOTE-source list.  The local list only reads the device's own feature
    block, so its entire gather->matmul->segment-reduce pipeline is
    independent of the all_to_all: XLA's latency-hiding scheduler overlaps
    the collective with the local aggregation (the double-buffering asked
    for by SURVEY.md §7.5).  The two partial aggregations are then combined
    per destination row with the aggregator's exact merge (sum for
    sum/mean, elementwise max, and a shifted two-phase merge for the
    gamma-logsumexp "softmax" that is numerically exact across the split).

The math matches :func:`fgnn_tpu.ops.typed_mp_conv_coo` (NO_EXTENSION typed
messages, reference semantics per SURVEY.md §2.1.1) — parity is asserted in
tests/test_halo.py on an 8-virtual-device mesh for all four aggregators.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static exchange plan for one graph structure (host-side numpy).

    Shapes: D = n_shards, H = halo width (max boundary rows any device needs
    from any other), EL/ER = per-device local/remote edge-slot counts.
    """

    n_shards: int
    n_src: int               # original source-row count
    n_dst: int               # original destination-row count
    src_block: int           # Ns: padded source rows per device
    dst_block: int           # Nd: padded destination rows per device
    halo: int                # H
    send_idx: np.ndarray     # (D, D, H) int32: rows p sends to d (local ids)
    src_loc: np.ndarray      # (D, EL) int32 into the device's own x block
    dst_loc: np.ndarray      # (D, EL) int32 local destination row
    mask_loc: np.ndarray     # (D, EL) bool
    perm_loc: np.ndarray     # (D, EL) int64 original edge index (0 if pad)
    src_rem: np.ndarray      # (D, ER) int32 into the received (D*H) halo rows
    dst_rem: np.ndarray      # (D, ER) int32
    mask_rem: np.ndarray     # (D, ER) bool
    perm_rem: np.ndarray     # (D, ER) int64

    # ------------------------------------------------------------ utilities
    def pad_src(self, x: jax.Array) -> jax.Array:
        """Zero-pad source features (n_src, C) to (D * Ns, C)."""
        total = self.n_shards * self.src_block
        pad = total - x.shape[0]
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    def shard_edge_data(self, arr: np.ndarray):
        """Reorder per-edge data (E, ...) into the plan's (D, EL, ...) local
        and (D, ER, ...) remote layouts (padding slots zeroed)."""
        arr = np.asarray(arr)
        loc = arr[self.perm_loc] * self.mask_loc.reshape(
            self.mask_loc.shape + (1,) * (arr.ndim - 1)).astype(arr.dtype)
        rem = arr[self.perm_rem] * self.mask_rem.reshape(
            self.mask_rem.shape + (1,) * (arr.ndim - 1)).astype(arr.dtype)
        return loc, rem

    @property
    def comm_rows_per_device(self) -> int:
        """Rows each device ships over ICI ((D-1) * H real slots)."""
        return (self.n_shards - 1) * self.halo


def build_halo_plan(src, dst, n_src: int, n_dst: int,
                    n_shards: int) -> HaloPlan:
    """Build the static halo-exchange plan for an edge list.

    src/dst: (E,) int arrays (valid edges only — pad AFTER planning is not
    supported; masked padding slots are created by the plan itself).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    D = int(n_shards)
    Ns = -(-n_src // D)
    Nd = -(-n_dst // D)
    owner_src = src // Ns
    owner_dst = dst // Nd

    shard_edges = [np.nonzero(owner_dst == d)[0] for d in range(D)]
    # Per-shard local/remote split + halo lists.
    needed = [[None] * D for _ in range(D)]   # needed[d][p]: global src ids
    loc_lists, rem_lists = [], []
    H = 1
    for d in range(D):
        e = shard_edges[d]
        is_loc = owner_src[e] == d
        loc_lists.append(e[is_loc])
        rem_lists.append(e[~is_loc])
        for p in range(D):
            if p == d:
                continue
            ids = np.unique(src[e[~is_loc][owner_src[e[~is_loc]] == p]])
            needed[d][p] = ids
            H = max(H, len(ids))

    EL = max(1, max(len(l) for l in loc_lists))
    ER = max(1, max(len(r) for r in rem_lists))

    send_idx = np.zeros((D, D, H), np.int32)
    src_loc = np.zeros((D, EL), np.int32)
    dst_loc = np.zeros((D, EL), np.int32)
    mask_loc = np.zeros((D, EL), bool)
    perm_loc = np.zeros((D, EL), np.int64)
    src_rem = np.zeros((D, ER), np.int32)
    dst_rem = np.zeros((D, ER), np.int32)
    mask_rem = np.zeros((D, ER), bool)
    perm_rem = np.zeros((D, ER), np.int64)

    for d in range(D):
        # position of each needed remote row inside the received (D*H) halo
        pos = {}
        for p in range(D):
            if p == d:
                continue
            ids = needed[d][p]
            send_idx[p, d, : len(ids)] = (ids - p * Ns).astype(np.int32)
            for i, g in enumerate(ids):
                pos[int(g)] = p * H + i
        el = loc_lists[d]
        src_loc[d, : len(el)] = (src[el] - d * Ns).astype(np.int32)
        dst_loc[d, : len(el)] = (dst[el] - d * Nd).astype(np.int32)
        mask_loc[d, : len(el)] = True
        perm_loc[d, : len(el)] = el
        er = rem_lists[d]
        src_rem[d, : len(er)] = np.fromiter(
            (pos[int(g)] for g in src[er]), np.int32, count=len(er))
        dst_rem[d, : len(er)] = (dst[er] - d * Nd).astype(np.int32)
        mask_rem[d, : len(er)] = True
        perm_rem[d, : len(er)] = er

    return HaloPlan(
        n_shards=D, n_src=int(n_src), n_dst=int(n_dst), src_block=int(Ns),
        dst_block=int(Nd), halo=int(H), send_idx=send_idx,
        src_loc=src_loc, dst_loc=dst_loc, mask_loc=mask_loc,
        perm_loc=perm_loc, src_rem=src_rem, dst_rem=dst_rem,
        mask_rem=mask_rem, perm_rem=perm_rem)


# --------------------------------------------------------------------------
# Partial aggregation + exact combine per aggregator.
# --------------------------------------------------------------------------

def _partial(msgs, dstl, maskl, nd, aggregator, gamma):
    """Masked local partial aggregation of one edge list into (nd, C)."""
    if aggregator in ("sum", "mean"):
        msgs = jnp.where(maskl[:, None], msgs, 0.0)
        s = jax.ops.segment_sum(msgs, dstl, num_segments=nd)
        cnt = jax.ops.segment_sum(
            jnp.where(maskl, 1.0, 0.0), dstl, num_segments=nd)
        return s, cnt
    msgs = jnp.where(maskl[:, None], msgs, _NEG)
    m = jax.ops.segment_max(msgs, dstl, num_segments=nd)
    m = jnp.maximum(m, _NEG)  # truly-empty segments: -inf -> _NEG
    if aggregator == "max":
        return (m,)
    # softmax (gamma-logsumexp): keep (max, sum-of-shifted-exps)
    shifted = jnp.exp(gamma * (msgs - m[dstl]))
    s = jax.ops.segment_sum(shifted, dstl, num_segments=nd)
    return m, s


def _combine(pl, pr, aggregator, gamma):
    if aggregator in ("sum", "mean"):
        s = pl[0] + pr[0]
        if aggregator == "mean":
            cnt = pl[1] + pr[1]
            return s / jnp.maximum(cnt, 1.0)[:, None]
        return s
    if aggregator == "max":
        m = jnp.maximum(pl[0], pr[0])
        return jnp.where(m <= _NEG / 2, 0.0, m)
    # softmax: exact logsumexp merge of the two shifted partials
    m = jnp.maximum(pl[0], pr[0])
    s = (pl[1] * jnp.exp(gamma * (pl[0] - m))
         + pr[1] * jnp.exp(gamma * (pr[0] - m)))
    # destinations with no edge at all: match segment_logsumexp's
    # empty-segment value (max clamped to 0 -> log(1e-30)/gamma)
    m = jnp.where(m <= _NEG / 2, 0.0, m)
    return m + jnp.log(jnp.maximum(s, 1e-30)) / gamma


@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """Halo-partitioned graph handle consumed by model layers.

    Passed to :class:`fgnn_tpu.models.mp_conv.MPConv` IN PLACE of a dense
    ``nn_idx`` table (the same dispatch pattern as
    :class:`fgnn_tpu.ops.segment.CooGraph`): the layer then runs
    :func:`halo_typed_mp_coo` — row-sharded sources, one all_to_all of the
    boundary rows, local segment aggregation — instead of the dense or flat
    single-device kernels.  This is the large-graph scaling mode of
    SURVEY.md §2.6/§7.5 surfaced as a first-class model input.

    Everything here is trace-static (numpy plan + mesh), so a module
    argument of this type behaves like the static dense tables: close over
    it or mark it static when jitting.

    ``etype`` still arrives per-edge ``(E, T)`` in the ORIGINAL edge order
    (exactly what the emodel MLPs produce); the layer reorders it into the
    plan's local/remote shards device-side via :meth:`shard_etype`.
    """

    plan: HaloPlan
    mesh: Mesh
    axis: str = "data"

    def __hash__(self):
        return hash((id(self.plan), self.mesh, self.axis))

    def shard_etype(self, etype: jax.Array):
        """Device-side (E, T) -> plan-ordered (D, EL, T) / (D, ER, T)."""
        p = self.plan
        loc = etype[p.perm_loc] * p.mask_loc[..., None].astype(etype.dtype)
        rem = etype[p.perm_rem] * p.mask_rem[..., None].astype(etype.dtype)
        return loc, rem

    def pad_and_shard_src(self, x: jax.Array) -> jax.Array:
        """Pad (n_src, C) to (D*Ns, C) and place row-sharded on the mesh."""
        from jax.sharding import NamedSharding

        xp = self.plan.pad_src(x)
        return jax.lax.with_sharding_constraint(
            xp, NamedSharding(self.mesh, P(self.axis)))


def halo_typed_mp_coo(
    x: jax.Array,
    etype_loc: jax.Array,
    etype_rem: jax.Array,
    filters: jax.Array,
    nout: int,
    plan: HaloPlan,
    mesh: Mesh,
    *,
    axis: str = "data",
    aggregator: str = "max",
    gamma: float = 3.0,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Sharded-source COO typed message passing with halo exchange.

    x:         (D * Ns, C_in) — source features, padded via ``plan.pad_src``;
               sharded (or shardable) on rows over ``axis``.
    etype_loc: (D, EL, T), etype_rem: (D, ER, T) — per-edge type weights in
               plan order (``plan.shard_edge_data``), sharded on dim 0.
    filters:   (C_in, nout * T) replicated.
    Returns (D * Nd, nout) sharded on rows over ``axis``; rows >= plan.n_dst
    are padding.
    """
    D, Ns, Nd, H = plan.n_shards, plan.src_block, plan.dst_block, plan.halo
    T = etype_loc.shape[-1]

    def body(x_l, send_l, sl, dl, ml, el, sr, dr, mr, er, w):
        # Halo exchange: ship only the boundary rows each peer needs.
        send_buf = x_l[send_l[0]]                        # (D, H, C)
        recv = jax.lax.all_to_all(
            send_buf, axis, split_axis=0, concat_axis=0)  # (D, H, C)

        # Local-source pipeline — independent of `recv`, so XLA overlaps
        # the all_to_all with this gather/matmul/segment-reduce.
        h_l = (x_l @ w).reshape(Ns, nout, T)
        msgs_l = jnp.einsum("ect,et->ec", h_l[sl[0]], el[0])
        part_l = _partial(msgs_l, dl[0], ml[0], Nd, aggregator, gamma)

        # Remote-source pipeline over the received halo rows.
        h_r = (recv.reshape(D * H, -1) @ w).reshape(D * H, nout, T)
        msgs_r = jnp.einsum("ect,et->ec", h_r[sr[0]], er[0])
        part_r = _partial(msgs_r, dr[0], mr[0], Nd, aggregator, gamma)

        return _combine(part_l, part_r, aggregator, gamma)

    shard, rep = P(axis), P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(shard,) + (shard,) * 9 + (rep,),
        out_specs=shard,
    )
    out = fn(x, jnp.asarray(plan.send_idx),
             jnp.asarray(plan.src_loc), jnp.asarray(plan.dst_loc),
             jnp.asarray(plan.mask_loc), etype_loc,
             jnp.asarray(plan.src_rem), jnp.asarray(plan.dst_rem),
             jnp.asarray(plan.mask_rem), etype_rem,
             filters)
    if bias is not None:
        out = out + bias
    return out
