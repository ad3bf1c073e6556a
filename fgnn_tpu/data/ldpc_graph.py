"""LDPC factor-graph structure builders for the 96.3.963 code.

Equivalent of the reference ``ldpc_graph_structure_generator``
(/root/reference/lib/data/ldpc_dataset.py:11-129), but built from the
re-implemented alist parser and returned in the TPU layout:

  * bipartite ("SP") structure: per-variable check table ``nn_idx_f2v
    (96, 3)``, per-check variable table ``nn_idx_v2f (48, 6)``, and 7-dim
    per-edge features (the 6 signals of the incident check plus the
    variable's own / check's own signal), layout (N, K, 7)
  * joint ("high factor") structure: the [96 vars ; 48 checks] padded
    (144, 6) table with 2-channel side flags, for the concat formulation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .alist import AlistMatrix, default_paths, read_alist


@dataclass
class LDPCStructure:
    n_vars: int            # 96
    n_checks: int          # 48
    var_deg: int           # 3
    check_deg: int         # 6
    factors: np.ndarray    # (48, 6) variable ids per check
    var_checks: np.ndarray  # (96, 3) check ids per variable
    # joint [vars ; checks] graph (concat formulation)
    joint_nn_idx: np.ndarray   # (144, 6) — var rows point at 96+check, padded self
    joint_etype: np.ndarray    # (144, 6, 2) side flags

    @classmethod
    def from_alist_file(cls, path: str | None = None) -> "LDPCStructure":
        path = path or default_paths()["alist"]
        a = read_alist(path)
        # 96.3.963: N=96 variables (col deg 3), M=48 checks (row deg 6)
        n_vars, n_checks = a.N, a.M
        var_deg = a.max_col_deg
        check_deg = a.max_row_deg
        factors = np.asarray(a.row_items, dtype=np.int64)       # (48, 6)
        var_checks = np.asarray(a.col_items, dtype=np.int64)    # (96, 3)

        n_joint = n_vars + n_checks
        nn_idx = np.zeros((n_joint, check_deg), np.int64)
        etype = np.zeros((n_joint, check_deg, 2), np.float32)
        for v in range(n_vars):
            for j, c in enumerate(var_checks[v]):
                nn_idx[v, j] = n_vars + c
                etype[v, j, 0] = 1.0
            for j in range(var_deg, check_deg):
                nn_idx[v, j] = v            # self padding (ldpc_dataset.py:36-37)
        for c in range(n_checks):
            for j, v in enumerate(factors[c]):
                nn_idx[n_vars + c, j] = v
                etype[n_vars + c, j, 1] = 1.0
        return cls(n_vars, n_checks, var_deg, check_deg, factors, var_checks,
                   nn_idx, etype)

    # ------------------------------------------------------------------
    def check_signals(self, y: np.ndarray) -> np.ndarray:
        """Signals gathered per check: (48, 6) (get_highorder_feature)."""
        return y[self.factors]

    def bipartite_features(self, y: np.ndarray):
        """get_mpnn_sp_structure equivalent (ldpc_dataset.py:92-106).

        Returns (hop (48,6), nn_idx_f2v (96,3), nn_idx_v2f (48,6),
        efeature_f2v (96,3,7), efeature_v2f (48,6,7)) — efeatures already
        (N, K, C), i.e. the TPU layout.
        """
        hop = self.check_signals(y).astype(np.float32)          # (48, 6)
        nn_idx_f2v = self.var_checks                            # (96, 3)
        nn_idx_v2f = self.factors                               # (48, 6)
        # per (var, incident check): that check's 6 signals + own signal
        ef_f2v = np.concatenate(
            [hop[nn_idx_f2v],                                   # (96, 3, 6)
             np.repeat(y.reshape(-1, 1, 1), self.var_deg, axis=1)], axis=2
        ).astype(np.float32)                                    # (96, 3, 7)
        # per (check, member var): the check's 6 signals + that var's signal
        ef_v2f = np.concatenate(
            [np.repeat(hop[:, None, :], self.check_deg, axis=1),  # (48, 6, 6)
             hop[..., None]], axis=2
        ).astype(np.float32)                                    # (48, 6, 7)
        return hop, nn_idx_f2v, nn_idx_v2f, ef_f2v, ef_v2f

    def joint_features(self, y: np.ndarray):
        """get_high_factor_structure equivalent (ldpc_dataset.py:108-129).

        Returns (nn_idx (144,6), etype (144,6,2), efeature (144,6,7),
        hop (48,6)).
        """
        hop = self.check_signals(y).astype(np.float32)
        feat_h = hop[self.joint_nn_idx[: self.n_vars, : self.var_deg] - self.n_vars]
        ef_node = np.concatenate(
            [feat_h, np.repeat(y.reshape(-1, 1, 1), self.var_deg, axis=1)],
            axis=2).astype(np.float32)                           # (96, 3, 7)
        pad = np.zeros_like(ef_node)
        ef_node = np.concatenate([ef_node, pad], axis=1)         # (96, 6, 7)
        ef_hop = np.concatenate(
            [np.repeat(hop[:, None, :], self.check_deg, axis=1),
             hop[..., None]], axis=2).astype(np.float32)         # (48, 6, 7)
        efeature = np.concatenate([ef_node, ef_hop], axis=0)     # (144, 6, 7)
        return self.joint_nn_idx, self.joint_etype, efeature, hop


_DEFAULT: LDPCStructure | None = None


def default_structure() -> LDPCStructure:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = LDPCStructure.from_alist_file()
    return _DEFAULT
