"""Base modules: per-node MLP maps and small utility layers.

Mirrors /root/reference/lib/model/mpnn/base_model.py in (B, N, C) layout:

* ``IIDMap``   == iid_mapping    (base_model.py:43-60): 1x1 conv + LeakyReLU
* ``IIDMapBN`` == iid_mapping_bn (base_model.py:63-80): + BatchNorm + ReLU
* ``IIDMapIN`` == iid_mapping_in (base_model.py:83-90): + InstanceNorm + ReLU
* ``MaxPoolNodes`` == max_pool_layer (base_model.py:19-31)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .norm import BatchNorm, Dense, InstanceNorm, leaky_relu


class MessagePassing(nn.Module):
    """Marker base: modules whose __call__ takes (x, nn_idx, etype).

    The dispatch analogue of the reference's ``base_mp_nn.is_mp_nn`` flag
    (base_model.py:4-16); containers use isinstance checks on this type.
    """

    def is_mp(self):  # pragma: no cover - marker
        return True


class IIDMap(nn.Module):
    """Per-node Dense + LeakyReLU (iid_mapping, base_model.py:43-60)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return leaky_relu(Dense(self.features, self.use_bias, name="conv")(x))


class IIDMapBN(nn.Module):
    """Per-node Dense + BatchNorm + ReLU (iid_mapping_bn, base_model.py:63-80)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Dense(self.features, self.use_bias, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class IIDMapIN(nn.Module):
    """Per-node Dense + InstanceNorm + ReLU (iid_mapping_in, base_model.py:83-90)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = Dense(self.features, self.use_bias, name="conv")(x)
        x = InstanceNorm(name="in")(x)
        return nn.relu(x)


class MaxPoolNodes(nn.Module):
    """Max over the node axis, keepdim (max_pool_layer, base_model.py:19-31)."""

    axis: int = -2

    @nn.compact
    def __call__(self, x):
        return jnp.max(x, axis=self.axis, keepdims=True)


class Flatten(nn.Module):
    """(B, ...) -> (B, -1) (base_model.py:34-40)."""

    @nn.compact
    def __call__(self, x):
        return x.reshape(x.shape[0], -1)


class Identity(nn.Module):
    """Pass-through (identity.py:4-13)."""

    @nn.compact
    def __call__(self, x):
        return x


class MLP(nn.Module):
    """Per-node MLP: Dense stack with an activation between layers.

    Covers the reference "emodel" edge-weight MLPs, e.g.
    Conv(1->64)+ReLU+Conv(64->16) (train_syn_fixed_pw_hop.py:135-137,
    train_ldpc.py:32-38).
    """

    features: Sequence[int]
    activation: Callable = nn.relu
    final_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = Dense(f, name=f"dense_{i}")(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
            elif self.final_activation is not None:
                x = self.final_activation(x)
        return x
