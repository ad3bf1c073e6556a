"""Global mixed-precision policy.

Default is pure float32 (required for activation parity with the
reference).  ``set_compute_dtype(jnp.bfloat16)`` switches the matmul/
message-passing compute path to bf16 (params stay f32, normalization
statistics are always computed in f32) — the standard TPU recipe.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE = None  # None -> float32 end to end


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


def cast_compute(x):
    """Cast an activation to the compute dtype (no-op under f32 policy)."""
    if _COMPUTE_DTYPE is not None and x.dtype != _COMPUTE_DTYPE:
        return x.astype(_COMPUTE_DTYPE)
    return x


@contextlib.contextmanager
def compute_dtype(dtype):
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev
