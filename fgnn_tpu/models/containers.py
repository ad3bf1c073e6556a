"""Container modules: sequential / parallel / ensemble / global pooling.

Equivalents of the reference containers, dispatching on whether a child is a
message-passing module (takes the graph) or a per-node module:
sequential.py:8-39, parallel_net.py:15-43, ensemble.py:8-19, pooling.py:12-45.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .base import MessagePassing
from .mp_conv import MPConv, MPConvResidual


def _is_mp(mod) -> bool:
    return isinstance(mod, (MessagePassing, MPConv, MPConvResidual)) or getattr(
        mod, "takes_graph", False
    )


class MPSequential(nn.Module):
    """mp_sequential (sequential.py:8-39): pass (x, nn_idx, etype) to MP
    children, x alone to plain modules.  Layout (B, N, C)."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, x, nn_idx=None, etype=None, train: bool = True):
        extra = []
        for mod in self.layers:
            if _is_mp(mod):
                x = mod(x, nn_idx, etype, train=train)
            elif isinstance(mod, (IIDBlock,)):
                x = mod(x, train=train)
            else:
                x = mod(x)
            if isinstance(x, tuple):
                extra.extend(x[1:])
                x = x[0]
        if extra:
            return x, extra
        return x


class IIDBlock(nn.Module):
    """Dense + BatchNorm + ReLU block used inline in the reference's
    mp_sequential model definitions (train_syn_fixed_pw_hop.py:126-134)."""

    features: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .norm import BatchNorm, Dense

        x = Dense(self.features, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return self.activation(x)


class ParallelNet(nn.Module):
    """parallel_net (parallel_net.py:15-43): fan the input through N modules
    and sum (or custom-aggregate) the outputs."""

    branches: Sequence[Any]
    aggregator: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, nn_idx=None, etype=None, train: bool = True):
        outs = []
        for mod in self.branches:
            if _is_mp(mod):
                outs.append(mod(x, nn_idx, etype, train=train))
            elif isinstance(mod, IIDBlock):
                outs.append(mod(x, train=train))
            else:
                outs.append(mod(x))
        if self.aggregator is not None:
            return self.aggregator(*outs)
        res = outs[0]
        for o in outs[1:]:
            res = res + o
        return res


class MPEnsemble(nn.Module):
    """mp_ensemble (ensemble.py:8-19): model1(graph) || model2(extra) ->
    concat channels -> model3."""

    model1: Any
    model2: Any
    model3: Any

    @nn.compact
    def __call__(self, x, nn_idx, etype, *extra, train: bool = True):
        x1 = self.model1(x, nn_idx, etype, train=train)
        x2 = self.model2(x, *extra)
        cat = jnp.concatenate([x1, x2], axis=-1)
        return self.model3(cat)


class GlobalPooling(nn.Module):
    """global_pooling (pooling.py:12-45): max-pool over nodes, map/broadcast,
    concat back onto node features."""

    orig_mapper: Optional[Any] = None
    gfeature_mapper: Optional[Any] = None

    @nn.compact
    def __call__(self, x, nn_idx=None, etype=None, train: bool = True):
        n = x.shape[-2]
        g = jnp.max(x, axis=-2, keepdims=True)
        if self.orig_mapper is not None:
            x = self.orig_mapper(x, nn_idx, etype, train=train)
        if self.gfeature_mapper is not None:
            g = self.gfeature_mapper(g)
        g = jnp.broadcast_to(g, x.shape[:-2] + (n, g.shape[-1]))
        return jnp.concatenate([x, g], axis=-1)
