"""Numerics debugging helpers (SURVEY.md §5: the reference has none).

* :func:`nan_debug` — context manager enabling jax debug-NaN checks.
* :func:`check_finite` — raise on non-finite leaves of a pytree, naming
  the offending path (use around suspect train steps).
* :func:`deterministic` — seed numpy + return a fixed PRNGKey for
  reproducible test/debug runs.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debug(enabled: bool = True):
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def deterministic(seed: int = 0):
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
