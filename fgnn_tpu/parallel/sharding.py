"""Sharding rules for fgnn_tpu train states and batches.

Data-parallel: every array in a batch dict shards its leading (batch) axis
over the ``data`` mesh axis — except shared graph tables (no batch dim),
which replicate.

Tensor-parallel: parameter arrays whose last dimension is large and
divisible by the ``model`` axis size shard that dimension (the
``filters (C_in, C_out*T)`` banks and wide Dense kernels); everything else
replicates.  XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int, batched: bool = True) -> NamedSharding:
    if not batched:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh, batch_size: int) -> dict:
    """Device-put a batch dict with the batch axis over 'data'.

    Arrays whose leading dim equals ``batch_size`` (which must divide the
    data axis) shard; anything else (shared graph tables, scalars)
    replicates.  The batch size is explicit — guessing it from leading
    dims silently mis-shards any batch where a table dim collides with it.
    """
    dp = mesh.shape["data"]
    arrays = {k: np.asarray(v) for k, v in batch.items()}

    def put(x):
        batched = (x.ndim >= 1 and x.shape[0] == batch_size
                   and batch_size % dp == 0 and batch_size >= dp)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batched))

    return {k: put(v) for k, v in arrays.items()}


def _param_spec(path_leaf, mp: int):
    x = path_leaf
    if x.ndim >= 2 and x.shape[-1] % mp == 0 and x.shape[-1] >= 128 * mp:
        return P(*([None] * (x.ndim - 1)), "model")
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree: wide output dims sharded over 'model'."""
    mp = mesh.shape["model"]

    def put(x):
        spec = _param_spec(x, mp) if mp > 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params/batch_stats via the TP param
    rules (1-D stats replicate), opt_state and the step counter replicated
    (the optimizer runs on the optax.flatten'd vector)."""
    rep = NamedSharding(mesh, P())

    def put_rep(x):
        return jax.device_put(x, rep) if hasattr(x, "ndim") else x

    return state.replace(
        params=shard_params(state.params, mesh),
        batch_stats=shard_params(state.batch_stats, mesh),
        opt_state=jax.tree.map(put_rep, state.opt_state),
        gcnt=jax.device_put(state.gcnt, rep),
    )
