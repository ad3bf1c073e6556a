"""Point-cloud KNN helpers (reference lib/model/mpnn/utils.py:4-39).

Unused by the four reference trainers but part of the public model-ops API.
Layout (B, N, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import gather_nodes


def pairwise_distance(x: jax.Array) -> jax.Array:
    """Negative squared euclidean distance matrix (utils.py:4-18).

    x: (B, N, C) -> (B, N, N) where [b,i,j] = -||x_i - x_j||^2.
    """
    inner = -2.0 * jnp.einsum("bic,bjc->bij", x, x)
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)  # (B, N, 1)
    return -sq - inner - jnp.swapaxes(sq, -1, -2)


def knn_graph(x: jax.Array, k: int) -> jax.Array:
    """Top-k neighbor table from pairwise distances: (B, N, k) indices."""
    d = pairwise_distance(x)
    return jax.lax.top_k(d, k)[1].astype(jnp.int32)


def get_nn_node_feature(x: jax.Array, nn_idx: jax.Array) -> jax.Array:
    """Gather neighbor features (utils.py:21-35): (B, N, K, C)."""
    return gather_nodes(x, nn_idx)


def get_edge_feature(x: jax.Array, nn_idx: jax.Array) -> jax.Array:
    """Central-minus-neighbor differences (utils.py:38-39): (B, N, K, C)."""
    return x[:, :, None, :] - gather_nodes(x, nn_idx)
