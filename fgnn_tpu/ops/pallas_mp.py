"""Fused Pallas TPU kernel for the typed-edge message-passing hot path.

The XLA path of :func:`fgnn_tpu.ops.typed_mp_conv` (NO_EXTENSION) computes

    h   = x @ W                      # (B, N_src, C*T)   MXU
    hg  = h[:, nn_idx]               # (B, N_dst, K, C*T)  <-- materialized!
    msg = einsum('bnkct,bnkt->bnkc') # (B, N_dst, K, C)
    out = max/mean over k

The gather materializes a (B, N_dst, K, C*T) intermediate in HBM — for the
LDPC layers at C=256, T=4, B=256 that is hundreds of MB of traffic per
layer.  This kernel fuses gather + etype mixing + K-aggregation into one
VMEM-resident pass per batch element:

  * the gather runs as K one-hot matmuls on the MXU
    (one_hot(nn_idx[:, k]) @ h) — gather and layout change in one op;
  * h is fed in T-MAJOR column layout (t*C + c) so the T-contraction with
    etype is K*T lane-contiguous slice-multiply-accumulates (VPU), no 3D
    relayout inside the kernel;
  * only (N_dst, C) leaves the kernel (plus an argmax map for the VJP).

A custom VJP keeps training on the fused forward; the backward is an XLA
program whose gathers are K-sliced, so nothing bigger than
(B, N_dst, C*T) is materialized.

Constraints (checked by :func:`fused_available`): NO_EXTENSION, shared
(non-batched) nn_idx, K <= 16, aggregator in {max, mean, sum}, blocks
fitting VMEM.  ops/typed_mp.py remains the general fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under ~16MB/core


def _supported(h_shape, nn_idx_shape, aggregator: str) -> bool:
    if len(nn_idx_shape) != 2:
        return False
    if aggregator not in ("max", "mean", "sum"):
        return False
    B, Ns, CT = h_shape
    Nd, K = nn_idx_shape
    if K > 16:
        return False
    need = (Ns * CT + Nd * K * 8 + 3 * Nd * (CT // max(K, 1))) * 4
    return need < _VMEM_BUDGET


def _batch_tile(B: int, Ns: int, CT: int) -> int:
    """Rows of the batch per program: amortize launch overhead while
    keeping h/out blocks within the VMEM budget."""
    import os

    per_row = (Ns * CT + 3 * (CT // 4) * 4) * 4  # rough bytes per batch row
    g = max(1, int(_VMEM_BUDGET * 0.5) // max(per_row, 1))
    g = min(g, B, int(os.environ.get("FGNN_PALLAS_BATCH_TILE", "4")))
    while B % g:
        g -= 1
    return g


def _fused_fwd_pallas(h, nn_idx, etype, C: int, T: int, aggregator: str):
    """h (B, Ns, C*T) [c-major: c*T+t], nn_idx (Nd, K) int32,
    etype (B, Nd, K, T) -> (out (B, Nd, C), argmax (B, Nd, C) int32)."""
    B, Ns, CT = h.shape
    Nd, K = nn_idx.shape
    assert CT == C * T, (CT, C, T)
    # convert h columns to t-major (t*C + c) for lane-contiguous slicing
    h_t = h.reshape(B, Ns, C, T).transpose(0, 1, 3, 2).reshape(B, Ns, CT)
    et2 = etype.reshape(B, Nd, K * T)
    G = _batch_tile(B, Ns, CT)

    def kernel(idx_ref, h_ref, et_ref, out_ref, amax_ref):
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (Nd, Ns), 1)
        # one-hot gather matrices are shared across the G batch rows
        onehots = [
            (src_iota == idx_ref[:, k][:, None]).astype(h_ref.dtype)
            for k in range(K)
        ]
        for g in range(G):
            h_b = h_ref[g]                   # (Ns, T*C), t-major
            et_b = et_ref[g]                 # (Nd, K*T)
            acc = jnp.zeros((Nd, C), jnp.float32)
            amax = jnp.zeros((Nd, C), jnp.int32)
            for k in range(K):
                gk = jnp.dot(onehots[k], h_b,
                             preferred_element_type=jnp.float32)  # (Nd, T*C)
                m = jnp.zeros((Nd, C), jnp.float32)
                for t in range(T):
                    w = et_b[:, k * T + t][:, None].astype(jnp.float32)
                    m = m + w * gk[:, t * C:(t + 1) * C]
                if aggregator == "max":
                    if k == 0:
                        acc = m
                    else:
                        take = m > acc
                        acc = jnp.where(take, m, acc)
                        amax = jnp.where(take, k, amax)
                else:
                    acc = acc + m
            if aggregator == "mean":
                acc = acc / K
            out_ref[g] = acc.astype(out_ref.dtype)
            amax_ref[g] = amax

    out, amax = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((Nd, K), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Ns, CT), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Nd, K * T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, Nd, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Nd, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nd, C), h.dtype),
            jax.ShapeDtypeStruct((B, Nd, C), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * Nd * Ns * CT + 2 * B * K * Nd * C * T,
            bytes_accessed=4 * B * (Ns * CT + Nd * K * T + 2 * Nd * C),
            transcendentals=0,
        ),
    )(nn_idx, h_t, et2)
    return out, amax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_gather_mix_aggregate(h, nn_idx, etype, C, T, aggregator):
    """out[b,n,c] = agg_k sum_t etype[b,n,k,t] * h[b, nn_idx[n,k], c*T+t]."""
    out, _ = _fused_fwd_pallas(h, nn_idx, etype, C, T, aggregator)
    return out


def _fused_fwd(h, nn_idx, etype, C, T, aggregator):
    out, amax = _fused_fwd_pallas(h, nn_idx, etype, C, T, aggregator)
    return out, (h, nn_idx, etype, amax)


def _fused_bwd(C, T, aggregator, res, dout):
    h, nn_idx, etype, amax = res
    B, Ns, CT = h.shape
    Nd, K = nn_idx.shape

    dh = jnp.zeros_like(h)
    det_ks = []
    for k in range(K):  # K <= 16, static unroll
        if aggregator == "max":
            dm = dout * (amax == k).astype(dout.dtype)         # (B, Nd, C)
        elif aggregator == "mean":
            dm = dout / K
        else:
            dm = dout
        idx_k = nn_idx[:, k]                                   # (Nd,)
        hg = h[:, idx_k].reshape(B, Nd, C, T)
        det_ks.append(jnp.einsum("bnc,bnct->bnt", dm, hg))
        w = etype[:, :, k, :]                                  # (B, Nd, T)
        contrib = jnp.einsum("bnc,bnt->bnct", dm, w).reshape(B, Nd, CT)
        dh = dh + jax.vmap(
            lambda c, ik=idx_k: jax.ops.segment_sum(c, ik, num_segments=Ns)
        )(contrib)
    det = jnp.stack(det_ks, axis=2)                            # (B, Nd, K, T)
    return dh, None, det


fused_gather_mix_aggregate.defvjp(_fused_fwd, _fused_bwd)


def fused_available(h_shape, nn_idx_shape, aggregator: str) -> bool:
    try:
        return _supported(tuple(h_shape), tuple(nn_idx_shape), aggregator)
    except Exception:
        return False
