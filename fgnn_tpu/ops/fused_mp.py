"""Fully-fused Pallas TPU kernel for the typed message-passing conv.

This is the round-3 replacement for the partial kernel in pallas_mp.py.
It fuses the ENTIRE NO_EXTENSION typed conv — filter matmul, neighbor
gather, edge-type mixing and K-aggregation — into one VMEM-resident
kernel per batch tile, with a custom VJP whose backward is a second
Pallas kernel that RECOMPUTES the per-edge messages instead of saving
them.  Nothing larger than (B, N, C) ever touches HBM.

Why: the XLA lowering of :func:`fgnn_tpu.ops.typed_mp_conv` materializes
the gathered (Nd, K, B, C*T) tensor in HBM (75-300 MB per layer at the
LDPC flagship config) and its backward materializes the matching
outer-product cotangent — measured 8.7 ms of the 12.8 ms train step is
that HBM traffic (benchmarks/bisect_step.py).  Reference math:
/root/reference/lib/model/mpnn/mp_nn.py:115-175.

Kernel formulation (per batch element b):

  h2[t*Np+n, c] = (x[b] @ W_t)[n, c]            T matmuls      (MXU)
  A[e, t*Np+n]  = onehot[e, n] * et[b, e, t]    T slice-mults  (VPU)
  m             = A @ h2                         one matmul     (MXU)
  out[b, d, :]  = agg_k m[k*Nd+d, :]            K-block reduce (VPU)

with Np = N_src padded to the 128-lane tile so every slice offset is
hardware-aligned, and edges K-MAJOR (row k*Nd + d) so aggregation runs
on aligned sublane blocks.  The one-hot gather runs on the MXU where it
is 10-40x faster than an XLA gather, and the combined A operator folds
the etype mix into the same matmul.

The backward recomputes h2/A/m in VMEM, rebuilds the aggregation
cotangent (deterministic first-win argmax for max; softmax weights for
logsumexp), and emits dx / d_etype / dW via three more MXU matmul
groups.  dW is accumulated across the sequential batch grid into a
constant-index output block (the canonical Pallas reduction pattern).

Matmuls run with bfloat16 operands and f32 accumulation by default —
identical to the XLA path's default TPU matmul precision — and in f32
when ``precision='float32'`` (parity tests; CPU interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_typed_mp", "fused_supported"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_tile(B: int) -> int:
    for bt in (8, 4, 2):
        if B % bt == 0:
            return bt
    return 1


def fused_supported(x_shape, nn_idx_shape, etype_shape, aggregator: str,
                    extension_name: str = "none") -> bool:
    """Whether the fused kernel covers this conv instance."""
    if extension_name != "none":
        return False
    if len(nn_idx_shape) != 2 or len(x_shape) != 3 or len(etype_shape) != 4:
        return False
    if aggregator not in ("max", "mean", "sum", "softmax"):
        return False
    B, Ns, Cin = x_shape
    Nd, K = nn_idx_shape
    T = etype_shape[-1]
    if K > 8 or T > 8 or Nd % 8 != 0 or Nd < 8 or Ns % 8 != 0:
        return False
    if Ns > 512 or Cin > 1024 or B < 1:
        return False
    # VMEM estimate per program (f32 words, upper bound)
    Np = _round_up(Ns, _LANE)
    E = Nd * K
    BT = _batch_tile(B)
    C = 256  # conservative bound; real C known only at call time
    words = (2 * T * Np * max(Cin, C) + E * T * Np + 4 * E * C +
             Np * Cin + BT * (Ns * Cin + E * _LANE + Nd * C))
    return words * 4 < 10 * 1024 * 1024


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, et_ref, oh_ref, w_ref, out_ref, xp, h2, a, m,
                *, N, Np, Nd, K, T, BT, aggregator, gamma, mm_dtype):
    """One program = BT batch rows.

    x_ref: (BT, N, Cin)   et_ref: (BT, E, T)   oh_ref: (E, Np)
    w_ref: (T, Cin, C)    out_ref: (BT, Nd, C)
    scratch: xp (Np, Cin) f32, h2 (T*Np, C) mm, a (E, T*Np) mm, m (E, C) f32
    """
    xp[...] = jnp.zeros_like(xp)
    for bt in range(BT):
        xp[:N] = x_ref[bt]
        et = et_ref[bt]  # (E, T)
        for t in range(T):
            h2[t * Np:(t + 1) * Np] = jax.lax.dot(
                xp[...].astype(mm_dtype), w_ref[t].astype(mm_dtype),
                preferred_element_type=jnp.float32).astype(mm_dtype)
            a[:, t * Np:(t + 1) * Np] = (
                oh_ref[...] * et[:, t:t + 1]).astype(mm_dtype)
        m[...] = jax.lax.dot(a[...], h2[...],
                             preferred_element_type=jnp.float32)
        if aggregator == "max":
            acc = m[0:Nd]
            for k in range(1, K):
                acc = jnp.maximum(acc, m[k * Nd:(k + 1) * Nd])
        elif aggregator in ("sum", "mean"):
            acc = m[0:Nd]
            for k in range(1, K):
                acc = acc + m[k * Nd:(k + 1) * Nd]
            if aggregator == "mean":
                acc = acc * (1.0 / K)
        else:  # softmax: (1/g) * logsumexp(g * m) over k
            mx = m[0:Nd]
            for k in range(1, K):
                mx = jnp.maximum(mx, m[k * Nd:(k + 1) * Nd])
            s = jnp.zeros_like(mx)
            for k in range(K):
                s = s + jnp.exp(gamma * (m[k * Nd:(k + 1) * Nd] - mx))
            acc = mx + jnp.log(s) * (1.0 / gamma)
        out_ref[bt] = acc.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(g_ref, x_ref, et_ref, oh_ref, oht_ref, w_ref, wt_ref,
                dx_ref, det_ref, dw_ref,
                xp, h2, a, m, dm, dh2,
                *, N, Np, Nd, K, T, BT, aggregator, gamma, mm_dtype):
    """Recompute + backward.  One program = BT batch rows.

    g_ref: (BT, Nd, C)   oht_ref: (Np, E)   wt_ref: (T, C, Cin)
    dx_ref: (BT, N, Cin) det_ref: (BT, E, T) dw_ref: (T, Cin, C) f32 accum
    scratch: dm (E, C) f32, dh2 (T*Np, C) f32; rest as forward.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xp[...] = jnp.zeros_like(xp)
    for bt in range(BT):
        # ---- recompute forward to the per-edge messages m
        xp[:N] = x_ref[bt]
        et = et_ref[bt]  # (E, T)
        for t in range(T):
            h2[t * Np:(t + 1) * Np] = jax.lax.dot(
                xp[...].astype(mm_dtype), w_ref[t].astype(mm_dtype),
                preferred_element_type=jnp.float32).astype(mm_dtype)
            a[:, t * Np:(t + 1) * Np] = (
                oh_ref[...] * et[:, t:t + 1]).astype(mm_dtype)
        m[...] = jax.lax.dot(a[...], h2[...],
                             preferred_element_type=jnp.float32)

        g = g_ref[bt].astype(jnp.float32)  # (Nd, C)

        # ---- aggregation cotangent dm (E, C)
        if aggregator == "max":
            # deterministic first-win argmax, recomputed
            run = m[0:Nd]
            am = jnp.zeros_like(run, dtype=jnp.int32)
            for k in range(1, K):
                blk = m[k * Nd:(k + 1) * Nd]
                take = blk > run
                run = jnp.where(take, blk, run)
                am = jnp.where(take, k, am)
            for k in range(K):
                dm[k * Nd:(k + 1) * Nd] = jnp.where(am == k, g, 0.0)
        elif aggregator == "sum":
            for k in range(K):
                dm[k * Nd:(k + 1) * Nd] = g
        elif aggregator == "mean":
            gs = g * (1.0 / K)
            for k in range(K):
                dm[k * Nd:(k + 1) * Nd] = gs
        else:  # softmax
            mx = m[0:Nd]
            for k in range(1, K):
                mx = jnp.maximum(mx, m[k * Nd:(k + 1) * Nd])
            s = jnp.zeros_like(mx)
            for k in range(K):
                s = s + jnp.exp(gamma * (m[k * Nd:(k + 1) * Nd] - mx))
            lse = mx + jnp.log(s) * (1.0 / gamma)
            for k in range(K):
                dm[k * Nd:(k + 1) * Nd] = g * jnp.exp(
                    gamma * (m[k * Nd:(k + 1) * Nd] - lse))

        # ---- d_etype[b, e, t] = sum_c dm[e, c] * (oh @ h2_t)[e, c]
        dmc = dm[...].astype(mm_dtype)
        for t in range(T):
            hg = jax.lax.dot(oh_ref[...].astype(mm_dtype),
                             h2[t * Np:(t + 1) * Np],
                             preferred_element_type=jnp.float32)
            det_ref[bt, :, t:t + 1] = jnp.sum(
                dm[...] * hg, axis=1, keepdims=True).astype(det_ref.dtype)

        # ---- dh2 = A^T @ dm, built block-wise with the transposed one-hot
        for t in range(T):
            at = (oht_ref[...] * et[:, t:t + 1].reshape(1, -1)
                  ).astype(mm_dtype)
            dh2[t * Np:(t + 1) * Np] = jax.lax.dot(
                at, dmc, preferred_element_type=jnp.float32)

        # ---- dx[b] = sum_t dh2_t @ W_t^T ; dW_t += x^T @ dh2_t
        dxb = jnp.zeros((Np, dx_ref.shape[-1]), jnp.float32)
        for t in range(T):
            dh2t = dh2[t * Np:(t + 1) * Np].astype(mm_dtype)
            dxb = dxb + jax.lax.dot(dh2t, wt_ref[t].astype(mm_dtype),
                                    preferred_element_type=jnp.float32)
            dw_ref[t] += jax.lax.dot_general(
                xp[...].astype(mm_dtype), dh2t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[bt] = dxb[:N].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# custom-vjp wrapper over (x, et3, w3)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_fwd_impl(x, et3, w3, oh, oht, nout, aggregator, gamma,
                    mm_dtype_name, Nd, K):
    B, N, Cin = x.shape
    T = w3.shape[0]
    C = nout
    Np = _round_up(N, _LANE)
    E = Nd * K
    BT = _batch_tile(B)
    mm_dtype = jnp.dtype(mm_dtype_name)

    kern = functools.partial(
        _fwd_kernel, N=N, Np=Np, Nd=Nd, K=K, T=T, BT=BT,
        aggregator=aggregator, gamma=gamma, mm_dtype=mm_dtype)
    out = pl.pallas_call(
        kern,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, N, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, E, T), lambda i: (i, 0, 0)),
            pl.BlockSpec((E, Np), lambda i: (0, 0)),
            pl.BlockSpec((T, Cin, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, Nd, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nd, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Np, Cin), jnp.float32),
            pltpu.VMEM((T * Np, C), mm_dtype),
            pltpu.VMEM((E, T * Np), mm_dtype),
            pltpu.VMEM((E, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, et3, oh, w3)
    return out


def _fused_bwd_impl(x, et3, w3, oh, oht, nout, aggregator, gamma,
                    mm_dtype_name, Nd, K, g):
    B, N, Cin = x.shape
    T = w3.shape[0]
    C = nout
    Np = _round_up(N, _LANE)
    E = Nd * K
    BT = _batch_tile(B)
    mm_dtype = jnp.dtype(mm_dtype_name)
    wt3 = jnp.swapaxes(w3, 1, 2)  # (T, C, Cin)

    kern = functools.partial(
        _bwd_kernel, N=N, Np=Np, Nd=Nd, K=K, T=T, BT=BT,
        aggregator=aggregator, gamma=gamma, mm_dtype=mm_dtype)
    dx, det3, dw3 = pl.pallas_call(
        kern,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, Nd, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, N, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, E, T), lambda i: (i, 0, 0)),
            pl.BlockSpec((E, Np), lambda i: (0, 0)),
            pl.BlockSpec((Np, E), lambda i: (0, 0)),
            pl.BlockSpec((T, Cin, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((T, C, Cin), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BT, N, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, E, T), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, Cin, C), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, Cin), x.dtype),
            jax.ShapeDtypeStruct((B, E, T), et3.dtype),
            jax.ShapeDtypeStruct((T, Cin, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Np, Cin), jnp.float32),
            pltpu.VMEM((T * Np, C), mm_dtype),
            pltpu.VMEM((E, T * Np), mm_dtype),
            pltpu.VMEM((E, C), jnp.float32),
            pltpu.VMEM((E, C), jnp.float32),
            pltpu.VMEM((T * Np, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(g, x, et3, oh, oht, w3, wt3)
    return dx, det3, dw3.astype(w3.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused(x, et3, w3, oh, oht, nout, aggregator, gamma, mm_dtype_name,
           Nd, K):
    return _fused_fwd_impl(x, et3, w3, oh, oht, nout, aggregator, gamma,
                           mm_dtype_name, Nd, K)


def _fused_fwd(x, et3, w3, oh, oht, nout, aggregator, gamma, mm_dtype_name,
               Nd, K):
    out = _fused_fwd_impl(x, et3, w3, oh, oht, nout, aggregator, gamma,
                          mm_dtype_name, Nd, K)
    return out, (x, et3, w3, oh, oht)


def _fused_bwd(nout, aggregator, gamma, mm_dtype_name, Nd, K, res, g):
    x, et3, w3, oh, oht = res
    dx, det3, dw3 = _fused_bwd_impl(
        x, et3, w3, oh, oht, nout, aggregator, gamma, mm_dtype_name,
        Nd, K, g)
    return dx, det3, dw3, jnp.zeros_like(oh), jnp.zeros_like(oht)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_typed_mp(
    x: jax.Array,
    nn_idx: jax.Array,
    etype: jax.Array,
    filters: jax.Array,
    nout: int,
    *,
    aggregator: str = "max",
    gamma: float = 3.0,
    bias: Optional[jax.Array] = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """Drop-in fused replacement for typed_mp_conv's NO_EXTENSION path.

    x (B, N_src, Cin), nn_idx (Nd, K) shared, etype (B, Nd, K, T),
    filters (Cin, nout*T) in the reference column layout c*T+t.
    ``precision='float32'`` keeps in-kernel matmuls at f32 (parity tests);
    the default uses bf16 operands with f32 accumulation, matching the
    XLA path's default TPU matmul precision.
    """
    B, N, Cin = x.shape
    Nd, K = nn_idx.shape
    T = etype.shape[-1]
    Np = _round_up(N, _LANE)

    # layout transforms (all tiny; they stay inside the autodiff graph so
    # their transposes are differentiated by XLA, outside the custom VJP)
    w3 = jnp.transpose(filters.reshape(Cin, nout, T), (2, 0, 1))  # (T,Cin,C)
    # k-major edge order: row k*Nd + d
    et3 = jnp.transpose(etype, (0, 2, 1, 3)).reshape(B, K * Nd, T)
    oh = jax.nn.one_hot(nn_idx.T.reshape(-1), Np, dtype=jnp.float32)  # (E,Np)
    oht = jnp.transpose(oh)

    # CPU interpret mode cannot execute bf16 dots (and is correctness-only
    # anyway); bf16 operands are a TPU-MXU-specific choice.
    mm_dtype_name = ("float32" if (precision == "float32" or _interpret())
                     else "bfloat16")
    out = _fused(x.astype(jnp.float32), et3.astype(jnp.float32),
                 w3.astype(jnp.float32), oh, oht, nout, aggregator,
                 float(gamma), mm_dtype_name, Nd, K)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
