"""FactorGraph — the edge-list (COO) factor-graph IR.

SURVEY.md §7.1: the general form behind the padded gather tables.  A
``FactorGraph`` describes one factor type's variable-factor incidence as
flat edge arrays

    var_idx[e]  — variable endpoint
    fac_idx[e]  — factor endpoint
    slot[e]     — position of the variable within its factor (0..deg-1)
    edge_mask[e]— False for padding edges (static-shape discipline)

with static counts ``n_vars`` / ``n_factors``.  It supports:

  * construction from the reference-style padded tables (``from_factor_table``)
    and back (``to_v2f_table`` / ``to_f2v_table``) — the dense form is the
    special case with fixed degree;
  * device-side batching by DISJOINT UNION (``disjoint_union``): graphs
    concatenate with index offsets, replacing the reference's
    ``.repeat(batch, ...)`` replication — heterogeneous graphs batch into
    one static-shape graph (pad with ``pad_to`` first if sizes differ);
  * both message directions through the COO segment kernels
    (``v2f`` / ``f2v``) and the edge-partitioned multi-device path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

from .ops import typed_mp_conv_coo


class FactorGraph(struct.PyTreeNode):
    var_idx: jax.Array   # (E,) int32
    fac_idx: jax.Array   # (E,) int32
    slot: jax.Array      # (E,) int32
    edge_mask: jax.Array  # (E,) bool
    n_vars: int = struct.field(pytree_node=False)
    n_factors: int = struct.field(pytree_node=False)

    # ------------------------------------------------------------- builders
    @classmethod
    def from_edges(cls, var_idx, fac_idx, slot=None, n_vars=None,
                   n_factors=None, edge_mask=None) -> "FactorGraph":
        var_idx = np.asarray(var_idx, np.int32)
        fac_idx = np.asarray(fac_idx, np.int32)
        if slot is None:
            # slot = running count of each factor's edges, in input order
            slot = np.zeros_like(fac_idx)
            seen: dict = {}
            for e, f in enumerate(fac_idx):
                slot[e] = seen.get(int(f), 0)
                seen[int(f)] = slot[e] + 1
        if edge_mask is None:
            edge_mask = np.ones(var_idx.shape, bool)
        return cls(
            var_idx=jnp.asarray(var_idx),
            fac_idx=jnp.asarray(fac_idx),
            slot=jnp.asarray(np.asarray(slot, np.int32)),
            edge_mask=jnp.asarray(edge_mask),
            n_vars=int(n_vars if n_vars is not None else var_idx.max() + 1),
            n_factors=int(n_factors if n_factors is not None else fac_idx.max() + 1),
        )

    @classmethod
    def from_factor_table(cls, factors, n_vars: int,
                          valid=None) -> "FactorGraph":
        """factors: (N_fac, K) member-variable table (reference layout,
        e.g. the LDPC check table ldpc_dataset.py:41-49); ``valid`` masks
        padded slots."""
        factors = np.asarray(factors)
        nf, K = factors.shape
        fac_idx = np.repeat(np.arange(nf, dtype=np.int32), K)
        slot = np.tile(np.arange(K, dtype=np.int32), nf)
        var_idx = factors.reshape(-1).astype(np.int32)
        mask = (np.ones_like(var_idx, dtype=bool) if valid is None
                else np.asarray(valid).reshape(-1).astype(bool))
        return cls.from_edges(var_idx, fac_idx, slot, n_vars, nf, mask)

    # ----------------------------------------------------------- conversions
    def to_v2f_table(self) -> np.ndarray:
        """Padded (n_factors, max_deg) member table, -1 on empty slots."""
        fac = np.asarray(self.fac_idx)
        var = np.asarray(self.var_idx)
        slot = np.asarray(self.slot)
        mask = np.asarray(self.edge_mask)
        deg = int(slot[mask].max()) + 1 if mask.any() else 0
        out = -np.ones((self.n_factors, deg), np.int32)
        out[fac[mask], slot[mask]] = var[mask]
        return out

    def to_f2v_table(self) -> np.ndarray:
        """Padded (n_vars, max_var_deg) incident-factor table, -1 padded."""
        var = np.asarray(self.var_idx)
        fac = np.asarray(self.fac_idx)
        mask = np.asarray(self.edge_mask)
        counts = np.zeros(self.n_vars, np.int64)
        for v in var[mask]:
            counts[v] += 1
        deg = int(counts.max()) if counts.size else 0
        out = -np.ones((self.n_vars, deg), np.int32)
        fill = np.zeros(self.n_vars, np.int64)
        for v, f in zip(var[mask], fac[mask]):
            out[v, fill[v]] = f
            fill[v] += 1
        return out

    # ------------------------------------------------------------- batching
    @classmethod
    def disjoint_union(cls, graphs: Sequence["FactorGraph"]) -> "FactorGraph":
        """Concatenate graphs with index offsets (device-side batching)."""
        vo, fo = 0, 0
        vs, fs, ss, ms = [], [], [], []
        for g in graphs:
            vs.append(np.asarray(g.var_idx) + vo)
            fs.append(np.asarray(g.fac_idx) + fo)
            ss.append(np.asarray(g.slot))
            ms.append(np.asarray(g.edge_mask))
            vo += g.n_vars
            fo += g.n_factors
        return cls(
            var_idx=jnp.asarray(np.concatenate(vs)),
            fac_idx=jnp.asarray(np.concatenate(fs)),
            slot=jnp.asarray(np.concatenate(ss)),
            edge_mask=jnp.asarray(np.concatenate(ms)),
            n_vars=vo, n_factors=fo,
        )

    def pad_to(self, n_edges: int) -> "FactorGraph":
        """Pad the edge list to a static size with masked edges."""
        E = self.var_idx.shape[0]
        assert n_edges >= E
        pad = n_edges - E
        z = jnp.zeros(pad, jnp.int32)
        return self.replace(
            var_idx=jnp.concatenate([self.var_idx, z]),
            fac_idx=jnp.concatenate([self.fac_idx, z]),
            slot=jnp.concatenate([self.slot, z]),
            edge_mask=jnp.concatenate([self.edge_mask, jnp.zeros(pad, bool)]),
        )

    @property
    def n_edges(self) -> int:
        return int(self.var_idx.shape[0])

    # ---------------------------------------------------------- conversions
    def to_coo(self) -> "CooGraph":
        """This graph as a device CooGraph (v2f direction: src=vars,
        dst=factors over the [vars ; factors] joint numbering)."""
        from .ops.segment import CooGraph

        return CooGraph(
            src=self.var_idx,
            dst=self.fac_idx + self.n_vars,
            edge_mask=self.edge_mask,
            num_nodes=self.n_vars + self.n_factors,
        )

    # ---------------------------------------------------------- message ops
    def v2f(self, var_features, etype, filters, nout, *, aggregator="max",
            gamma=3.0, bias=None):
        """Variable -> factor typed messages: (n_factors, nout)."""
        return typed_mp_conv_coo(
            var_features, self.var_idx, self.fac_idx, etype, filters, nout,
            self.n_factors, aggregator=aggregator, gamma=gamma, bias=bias,
            edge_mask=self.edge_mask)

    def f2v(self, fac_features, etype, filters, nout, *, aggregator="max",
            gamma=3.0, bias=None):
        """Factor -> variable typed messages: (n_vars, nout)."""
        return typed_mp_conv_coo(
            fac_features, self.fac_idx, self.var_idx, etype, filters, nout,
            self.n_vars, aggregator=aggregator, gamma=gamma, bias=bias,
            edge_mask=self.edge_mask)


def build_joint_coo(tables, efeatures, n_vars_list):
    """Disjoint-union batch of concat-formulation JOINT graphs -> CooGraph.

    The concat (FactorMPNN) formulation runs one conv over the joint
    [vars ; factors] node set per sample (reference factor_mpnn.py:106);
    this builds the flat multi-sample equivalent so heterogeneous graph
    sizes batch WITHOUT padding to a common (N, K) table — the device-side
    batching SURVEY.md §7.1 calls for, replacing the reference's
    ``.repeat(bsize, ...)`` replication.

    tables:      per sample (N_b, K_b) joint neighbor table (rows 0..L_b-1
                 are variables, rows L_b..N_b-1 are that type's factors,
                 entries in joint-sample numbering — the layout of
                 fgnn_tpu.data.tables.pw_factor_table / high_factor_table)
    efeatures:   per sample (N_b, K_b, C) per-edge features
    n_vars_list: per sample L_b

    Returns (coo: CooGraph over the VARS-FIRST union numbering
    [all vars by sample ; all factors by sample], ef_edges (E_total, C),
    meta dict with var/factor offsets for splitting features back).
    """
    from .ops.segment import CooGraph

    graphs = []
    n_nodes = []
    for tab, L in zip(tables, n_vars_list):
        tab = np.asarray(tab)
        graphs.append(FactorGraph.from_factor_table(
            tab, n_vars=tab.shape[0]))   # joint-local: var_idx=src, fac=dst
        n_nodes.append(tab.shape[0])
    u = FactorGraph.disjoint_union(graphs)   # interleaved union numbering

    n_nodes = np.asarray(n_nodes)
    n_vars = np.asarray(list(n_vars_list))
    n_facs = n_nodes - n_vars
    off = np.concatenate([[0], np.cumsum(n_nodes)])     # interleaved offsets
    v_off = np.concatenate([[0], np.cumsum(n_vars)])    # vars-first offsets
    f_off = np.concatenate([[0], np.cumsum(n_facs)])
    NV, NF = int(v_off[-1]), int(f_off[-1])

    def remap(g):
        g = np.asarray(g, np.int64)
        b = np.searchsorted(off, g, side="right") - 1
        j = g - off[b]
        is_var = j < n_vars[b]
        return np.where(is_var, v_off[b] + j,
                        NV + f_off[b] + (j - n_vars[b])).astype(np.int32)

    src = remap(np.asarray(u.var_idx))
    dst = remap(np.asarray(u.fac_idx))
    seg = np.concatenate([
        np.repeat(np.arange(len(n_vars), dtype=np.int32), n_vars),
        np.repeat(np.arange(len(n_facs), dtype=np.int32), n_facs)])
    ef_edges = np.concatenate(
        [np.asarray(ef).reshape(-1, np.asarray(ef).shape[-1])
         for ef in efeatures])

    coo = CooGraph(
        src=jnp.asarray(src), dst=jnp.asarray(dst),
        edge_mask=u.edge_mask, num_nodes=NV + NF,
        seg=jnp.asarray(seg), num_segments=len(n_vars_list))
    meta = dict(n_vars=NV, n_factors=NF, v_off=v_off, f_off=f_off)
    return coo, jnp.asarray(ef_edges.astype(np.float32)), meta
