"""ctypes bindings for the native LDPC core (ldpc_core.cpp).

Builds the shared library on demand with g++ (cached in build/); falls back
to the numpy implementation in fgnn_tpu.data.bp_ref when no compiler is
available.  The C++ and numpy decoders are verified equal in
tests/test_ldpc_data.py (test_cpp_decoder_matches_numpy and friends).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "build")
_SO_PATH = os.path.join(_BUILD_DIR, "libldpc_core.so")
_SRC = os.path.join(_HERE, "ldpc_core.cpp")

_lock = threading.Lock()
_lib = None
_build_error: Exception | None = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC)):
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO_PATH + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO_PATH + ".tmp", _SO_PATH)
    return _SO_PATH


def get_lib():
    """Return the loaded ctypes library, building it if needed.

    Raises the original build/load error if native support is unavailable.
    """
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise _build_error
        try:
            path = _build()
            lib = ctypes.CDLL(path)
        except Exception as e:  # pragma: no cover - depends on toolchain
            _build_error = e
            raise
        lib.ldpc_bp_decode_batch.restype = ctypes.c_int
        lib.ldpc_bp_decode_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ldpc_encode_batch.restype = None
        lib.ldpc_encode_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def bp_decode_batch(graph, bias: np.ndarray, z: np.ndarray | None = None,
                    max_loops: int = 100):
    """Batched native decode.  graph: fgnn_tpu.data.bp_ref.BPGraph.

    bias: (B, N) P(bit=1).  Returns (x (B, N) uint8, success (B,) bool,
    iters (B,) int32).
    """
    lib = get_lib()
    bias = np.ascontiguousarray(bias, dtype=np.float64)
    if bias.ndim == 1:
        bias = bias[None]
    B, N = bias.shape
    assert N == graph.N
    rd = graph.row_cols.shape[1]
    cd = graph.col_rows.shape[1]
    row_cols = np.ascontiguousarray(graph.row_cols, np.int32)
    col_rows = np.ascontiguousarray(graph.col_rows, np.int32)
    col_slot = np.ascontiguousarray(graph.col_slot, np.int32)
    x = np.zeros((B, N), np.uint8)
    viols = np.zeros(B, np.int32)
    iters = np.zeros(B, np.int32)
    if z is not None:
        z = np.ascontiguousarray(z, np.uint8)
        zp = z.ctypes.data_as(ctypes.c_void_p)
    else:
        zp = None
    rc = lib.ldpc_bp_decode_batch(
        N, graph.M, rd, cd, _i32p(row_cols), _i32p(col_rows), _i32p(col_slot),
        bias.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), zp, B, max_loops,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _i32p(viols),
        _i32p(iters))
    if rc != 0:
        raise RuntimeError(f"ldpc_bp_decode_batch failed rc={rc}")
    return x, viols == 0, iters


def encode_batch(G: np.ndarray, s: np.ndarray) -> np.ndarray:
    """t = G s mod 2 for a batch.  G: (N, K) uint8, s: (B, K) -> (B, N)."""
    lib = get_lib()
    G = np.ascontiguousarray(G, np.uint8)
    s = np.ascontiguousarray(s, np.uint8)
    if s.ndim == 1:
        s = s[None]
    B, K = s.shape
    N = G.shape[0]
    assert G.shape[1] == K
    t = np.zeros((B, N), np.uint8)
    lib.ldpc_encode_batch(
        K, N, G.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), B,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return t
