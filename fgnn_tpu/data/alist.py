"""Parsers for the LDPC code assets: MacKay alist matrices and Radford
Neal's binary mod2 (bit-packed GF(2)) matrix format.

Formats (reference implementations, not copied, re-derived from):
  * alist: /root/reference/lib/data/MNC/ansi/cmatrix.cpp (read_allocate_alist)
    — header "N M", "max_col_deg max_row_deg", per-column degrees, per-row
    degrees, then N lines of column entries and M lines of row entries
    (1-based, zero-padded when degrees vary).
  * mod2mat: /root/reference/lib/data/MNC/radford/mod2mat.{h,cpp}
    (mod2mat_read/mod2mat_write) — int32 n_rows, int32 n_cols, then per
    column ceil(n_rows/32) words of sizeof(unsigned long)=8 bytes, with
    bits packed low-order-first into the LOW 32 bits of each word.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class AlistMatrix:
    """Sparse GF(2) matrix in adjacency-list form.

    N = number of columns (variables), M = number of rows (checks).
    ``col_items[n]`` lists the (0-based) rows containing column n;
    ``row_items[m]`` lists the (0-based) columns in row m.
    """

    N: int
    M: int
    col_items: list
    row_items: list

    @property
    def max_col_deg(self) -> int:
        return max(len(c) for c in self.col_items)

    @property
    def max_row_deg(self) -> int:
        return max(len(r) for r in self.row_items)

    def to_dense(self) -> np.ndarray:
        H = np.zeros((self.M, self.N), dtype=np.uint8)
        for m, cols in enumerate(self.row_items):
            H[m, cols] = 1
        return H

    def syndrome(self, x: np.ndarray) -> np.ndarray:
        """A x mod 2 (alist_times_cvector_mod2 equivalent)."""
        return (self.to_dense() @ np.asarray(x, np.int64)) % 2


def read_alist(path: str) -> AlistMatrix:
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    N, M = int(next(it)), int(next(it))
    max_cd, max_rd = int(next(it)), int(next(it))
    col_deg = [int(next(it)) for _ in range(N)]
    row_deg = [int(next(it)) for _ in range(M)]
    col_items = []
    for n in range(N):
        entries = [int(next(it)) for _ in range(max_cd)]
        col_items.append([e - 1 for e in entries if e > 0])
        assert len(col_items[-1]) == col_deg[n], (n, entries, col_deg[n])
    row_items = []
    for m in range(M):
        entries = [int(next(it)) for _ in range(max_rd)]
        row_items.append([e - 1 for e in entries if e > 0])
        assert len(row_items[-1]) == row_deg[m], (m, entries, row_deg[m])
    return AlistMatrix(N, M, col_items, row_items)


def read_mod2mat(path: str) -> np.ndarray:
    """Read a Radford-Neal binary mod2 matrix -> dense uint8 (n_rows, n_cols)."""
    raw = open(path, "rb").read()
    n_rows, n_cols = np.frombuffer(raw[:8], dtype="<i4")
    n_words = (n_rows + 31) // 32
    words = np.frombuffer(raw[8:], dtype="<u8")
    assert words.size == n_cols * n_words, (words.size, n_cols, n_words)
    words = words.reshape(n_cols, n_words)
    out = np.zeros((n_rows, n_cols), dtype=np.uint8)
    for i in range(n_rows):
        w, b = divmod(i, 32)
        out[i] = (words[:, w] >> np.uint64(b)) & np.uint64(1)
    return out


# Bundled code assets: the framework ships its own copy of the public MacKay
# 96.3.963 code files (same published code as the reference's ldpc_codes/).
CODES_DIR = os.path.join(os.path.dirname(__file__), "codes", "96.3.963")


def default_paths():
    return {
        "alist": os.path.join(CODES_DIR, "96.3.963"),
        "A2": os.path.join(CODES_DIR, "A2"),
        "G": os.path.join(CODES_DIR, "G"),
    }
