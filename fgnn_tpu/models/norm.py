"""Normalization layers and init helpers with exact PyTorch semantics.

The reference relies on torch defaults for BatchNorm2d / InstanceNorm2d /
Conv2d-1x1 init; activation parity (BASELINE.md north star) hangs on
reproducing them.  Feature layout here is ``(B, N, C)``:

* ``BatchNorm``  == torch.nn.BatchNorm2d on (B, C, N, 1): normalize each
  channel over (B, N); affine; running stats with momentum 0.1 (torch
  convention), eps 1e-5.  Under pjit with the batch axis sharded, the batch
  statistics are computed over the *global* batch by XLA — i.e. a true
  SyncBatchNorm, fixing the reference's stub (mp_nn.py:4).
* ``InstanceNorm`` == torch.nn.InstanceNorm2d defaults: per-sample,
  per-channel over N, NO affine params, no running stats (train == eval).
* ``BatchNorm1d`` semantics are the C==feature case of ``BatchNorm``.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_kaiming_uniform(key, shape, dtype=jnp.float32, fan_in: Optional[int] = None):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) — the Conv/Linear default.

    bound = sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(fan_in) for a = sqrt(5).
    ``shape`` is the JAX kernel shape (fan_in, fan_out) unless fan_in given.
    """
    if fan_in is None:
        fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_uniform(key, shape, dtype=jnp.float32, fan_in: int = 1):
    """torch Conv/Linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Module):
    """Per-node linear map == torch Conv2d(nin, nout, 1) on (B, C, N, 1).

    Uses torch-default init so freshly-initialized models are distributed
    like the reference.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from .policy import cast_compute

        x = cast_compute(x)
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", lambda k, s: torch_kaiming_uniform(k, s), (fan_in, self.features)
        )
        y = jnp.matmul(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: torch_bias_uniform(k, s, fan_in=fan_in),
                (self.features,),
            )
            y = y + bias.astype(x.dtype)
        return y


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm2d semantics on (..., C): stats over all axes but -1.

    train=True uses batch stats and updates ``batch_stats`` running averages
    (torch momentum 0.1: new = 0.9*old + 0.1*batch, unbiased var for the
    running average, biased for normalization — exactly torch).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)  # stats always in f32 (bf16 policy safe)
            mean = jnp.mean(xf, axis=reduce_axes)
            # two-pass squared-deviation form: E[x^2]-E[x]^2 cancels
            # catastrophically in f32 when |mean| >> std (torch is
            # stable; a one-pass variant was tried and FAILED full-config
            # golden parity by 0.1 absolute on the syn_fixed model)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype) + bias.astype(x.dtype)


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNorm2d defaults on (B, N, C): per (b, c) over N.

    affine=False, track_running_stats=False — stateless, train == eval.

    For flat disjoint-union batches (x (N_flat, C)) pass ``seg`` (the
    per-node sample id, -1 for padding) and ``num_segments``: statistics
    are then per (sample, channel), matching the dense per-sample form.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, seg=None, num_segments: int = 1):
        xf = x.astype(jnp.float32)  # stats always in f32 (bf16 policy safe)
        if seg is None:
            mean = jnp.mean(xf, axis=-2, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-2, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        sid = jnp.where(seg >= 0, seg, num_segments)     # padding -> extra bin
        nb = num_segments + 1
        cnt = jnp.maximum(
            jax.ops.segment_sum(jnp.ones_like(sid, jnp.float32), sid, nb), 1.0)
        mean = jax.ops.segment_sum(xf, sid, nb) / cnt[:, None]
        dev = xf - mean[sid]
        var = jax.ops.segment_sum(jnp.square(dev), sid, nb) / cnt[:, None]
        return (dev * jax.lax.rsqrt(var[sid] + self.eps)).astype(x.dtype)


def leaky_relu(x, negative_slope: float = 0.01):
    """torch.nn.LeakyReLU default slope 0.01."""
    return jnp.where(x >= 0, x, negative_slope * x)
