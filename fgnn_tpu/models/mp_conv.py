"""MPConv — the flax module wrapping the typed-edge message passing op.

Equivalent of the reference ``mp_conv_v2`` (mp_nn.py:13-175) and
``mp_conv_residual`` (mp_nn_residual.py:7-56) in (B, N, C) layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import Extension, typed_mp_conv
from ..ops.segment import CooGraph, typed_mp_conv_coo
from .norm import BatchNorm, Dense, leaky_relu

_COO_EXT = {Extension.NO_EXTENSION: "none",
            Extension.ORIG_WITH_DIFF: "diff",
            Extension.ORIG_WITH_NEIGHBOR: "neighbor"}


def _filters_init(key, shape):
    # mp_nn.py:49 — U(-0.01, 0.01)
    return jax.random.uniform(key, shape, jnp.float32, -0.01, 0.01)


def _bias_init(key, shape):
    # mp_nn.py:53 — U(0, 0.05)
    return jax.random.uniform(key, shape, jnp.float32, 0.0, 0.05)


class MPConv(nn.Module):
    """Typed-edge graph conv: gather -> filter bank -> etype mix -> aggregate
    -> bias -> BatchNorm -> ReLU (mp_nn.py:115-175).

    Attributes mirror mp_conv_v2.__init__ (mp_nn.py:18-66); defaults match:
    extension=ORIG_WITH_DIFF, aggregator='softmax' (gamma=3).
    """

    nout: int
    nedge_types: int
    use_bias: bool = True
    use_bn: bool = True
    extension: Extension = Extension.ORIG_WITH_DIFF
    activation: Optional[str] = "relu"
    aggregator: str = "softmax"
    gamma: float = 3.0

    @nn.compact
    def __call__(self, x, nn_idx, etype, train: bool = True):
        cin = x.shape[-1]
        cin_eff = cin if self.extension == Extension.NO_EXTENSION else 2 * cin
        filters = self.param(
            "filters", _filters_init, (cin_eff, self.nout * self.nedge_types)
        )
        bias = self.param("bias", _bias_init, (self.nout,)) if self.use_bias else None

        from ..parallel.halo import HaloGraph, halo_typed_mp_coo

        if isinstance(nn_idx, HaloGraph):
            # halo-partitioned large graph: x (n_src, C) flat, etype (E, T)
            # in original edge order; sources row-shard over the mesh and
            # boundary rows ride one all_to_all (parallel/halo.py).
            # Returns (D * dst_block, nout) row-sharded; rows >= plan.n_dst
            # are padding — use shard-divisible n_dst (or train=False) so
            # BatchNorm batch statistics see no padding rows.
            if self.extension != Extension.NO_EXTENSION:
                raise NotImplementedError(
                    "halo mode implements NO_EXTENSION message passing")
            g = nn_idx
            et_loc, et_rem = g.shard_etype(etype)
            y = halo_typed_mp_coo(
                g.pad_and_shard_src(x), et_loc, et_rem, filters, self.nout,
                g.plan, g.mesh, axis=g.axis, aggregator=self.aggregator,
                gamma=self.gamma, bias=bias,
            )
        elif isinstance(nn_idx, CooGraph):
            # flat disjoint-union batch: x (N_flat, C), etype (E, T)
            g = nn_idx
            y = typed_mp_conv_coo(
                x, g.src, g.dst, etype, filters, self.nout, g.num_nodes,
                aggregator=self.aggregator, gamma=self.gamma, bias=bias,
                edge_mask=g.edge_mask, extension=_COO_EXT[self.extension],
            )
        else:
            y = typed_mp_conv(
                x,
                nn_idx,
                etype,
                filters,
                self.nout,
                extension=self.extension,
                aggregator=self.aggregator,
                gamma=self.gamma,
                bias=bias,
            )
        if self.use_bn:
            y = BatchNorm(name="bn")(y, use_running_average=not train)
        if self.activation == "relu":
            y = nn.relu(y)
        return y


class MPConvResidual(nn.Module):
    """Bottleneck MP block (mp_nn_residual.py:7-56):

    Dense(nin->nmed)+BN+LeakyReLU -> MPConv(nmed->nmed) ->
    Dense(nmed->nout)+BN+LeakyReLU [+ residual when with_residual].

    Defaults match the reference: extension=ORIG_WITH_DIFF, aggregator='max',
    nout=nin when unspecified.
    """

    nmed: int
    nedge_types: int
    extension: Extension = Extension.ORIG_WITH_DIFF
    with_residual: bool = True
    aggregator: str = "max"
    nout: Optional[int] = None

    @nn.compact
    def __call__(self, x, nn_idx, etype, train: bool = True):
        nout = self.nout if self.nout is not None else x.shape[-1]
        h = Dense(self.nmed, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, use_running_average=not train)
        h = leaky_relu(h)
        h = MPConv(
            self.nmed,
            self.nedge_types,
            extension=self.extension,
            aggregator=self.aggregator,
            name="mp_conv",
        )(h, nn_idx, etype, train=train)
        h = Dense(nout, name="conv2")(h)
        h = BatchNorm(name="bn2")(h, use_running_average=not train)
        h = leaky_relu(h)
        if self.with_residual:
            h = h + x
        return h


class GConvResidual(nn.Module):
    """gconv_residual (mp_nn.py:178-199): like MPConvResidual but with
    ReLU nonlinearities, mp_conv defaults (softmax/DIFF), nout == nin."""

    nmed: int
    nedge_types: int
    with_residual: bool = True

    @nn.compact
    def __call__(self, x, nn_idx, etype, train: bool = True):
        h = Dense(self.nmed, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = MPConv(self.nmed, self.nedge_types, name="mp_conv")(
            h, nn_idx, etype, train=train
        )
        h = Dense(x.shape[-1], name="conv2")(h)
        h = BatchNorm(name="bn2")(h, use_running_average=not train)
        h = nn.relu(h)
        if self.with_residual:
            h = h + x
        return h
