"""Typed-edge message passing — the core FGNN compute primitive.

Implements the exact math of the reference ``mp_conv_v2``
(/root/reference/lib/model/mpnn/mp_nn.py:115-175) in a TPU-native layout:

  * features are ``(B, N, C)`` (channels last -> TPU lanes),
  * the per-edge-type filter bank is one big matmul on the MXU,
  * on TPU, the neighbor gather + etype contraction + K-aggregation run in
    the fused Pallas kernel (ops/fused_mp.py, default); the pure-XLA
    one-hot-matmul path below is the fallback and the CPU/parity path.

Per destination node ``i`` with neighbor slot ``k`` (source ``j = nn_idx[i,k]``):

  NO_EXTENSION       m[i,k] = sum_t etype[i,k,t] * (W_t x[j])
  ORIG_WITH_NEIGHBOR m[i,k] = sum_t etype[i,k,t] * (W_t [x[i] ; x[j]])
  ORIG_WITH_DIFF     m[i,k] = sum_t etype[i,k,t] * (W_t [x[i] ; x[i]-x[j]])

followed by an aggregation over k in {max, (1/g)*logsumexp(g*.), mean}
(mp_nn.py:68-90, g=3 by default) and a bias add (mp_n.py:165-168).

The reference semantics are kept bit-for-bit *including* its padding
behavior: padded slots in ``nn_idx`` (self-loops etc.) contribute real
messages, exactly as the reference's dense gather tables do — no masking.

Filter layout matches the reference parameter so checkpoints can be
transliterated: ``filters`` has shape ``(C_in, C_out * T)`` (or ``2*C_in``
for the extensions) where column index = c_out * T + t (mp_nn.py:128-134).
"""

from __future__ import annotations

import enum
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

def _use_fused() -> bool:
    """Fully-fused forward+backward Pallas kernel (ops/fused_mp.py, the
    lane-batched v2).  DEFAULT ON when running on a TPU; FGNN_FUSED=0
    forces the pure-XLA one-hot path, FGNN_FUSED=1 forces the kernel even
    off-TPU (interpret mode — slow, parity testing only)."""
    env = os.environ.get("FGNN_FUSED")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _spmd_fused_call(x, nn_idx, etype, filters, nout, *, extension_name,
                     aggregator, gamma, bias, precision):
    """Fused kernel under a registered training mesh: shard_map over batch.

    The kernel is embarrassingly parallel over the batch (shared trace-time
    tables, per-sample etype), so for a dp-sharded batch it runs unchanged
    per shard; the small filter banks and bias replicate (TP-sharded
    filters are all-gathered once — cheap next to keeping the 190M-class
    kernel instead of the XLA fallback).  Unmentioned mesh axes (``model``)
    stay replicated, so dp x tp meshes work with the conv compute
    replicated along tp.

    Returns the conv output, or None when no mesh is registered / the
    per-shard batch does not support the kernel (caller falls through to
    the XLA path, which partitions via ordinary pjit propagation).
    """
    from ..parallel.mesh import spmd_mesh

    mesh, axis = spmd_mesh()
    if mesh is None or axis not in mesh.shape or mesh.shape[axis] <= 1:
        return None
    dp = mesh.shape[axis]
    B = x.shape[0]
    if B % dp != 0:
        return None
    from .fused_mp import fused_supported, fused_typed_mp

    if not fused_supported((B // dp,) + tuple(x.shape[1:]),
                           jnp.shape(nn_idx),
                           (B // dp,) + tuple(etype.shape[1:]),
                           aggregator, extension_name=extension_name,
                           nout=nout):
        return None
    from jax.sharding import PartitionSpec as P

    args = [x, etype, filters]
    specs = [P(axis), P(axis), P()]
    if bias is not None:
        args.append(bias)
        specs.append(P())

    def local(xs, es, fs, *rest):
        return fused_typed_mp(
            xs, nn_idx, es, fs, nout, extension=extension_name,
            aggregator=aggregator, gamma=gamma,
            bias=rest[0] if rest else None, precision=precision)

    return jax.shard_map(local, mesh=mesh, in_specs=tuple(specs),
                         out_specs=P(axis), check_vma=False)(*args)


class Extension(enum.Enum):
    """Edge-input construction variants (mp_nn.py:7-10)."""

    NO_EXTENSION = 0
    ORIG_WITH_NEIGHBOR = 1
    ORIG_WITH_DIFF = 2


# Shared-table gathers over <= this many source nodes are rewritten as a
# one-hot matmul: on TPU the MXU runs the 0/1 contraction (each output row
# sums exactly one nonzero product) 10-40x faster than the XLA gather
# lowering, and its BACKWARD is another matmul instead of a scatter-add
# (the scatter is what made large batches pathological).
#
# PRECISION NOTE (structurally exact, numerically MXU-default): the one-hot
# contraction has exactly one nonzero product per output element, so there
# is no accumulation error at any precision.  On TPU, however, the MXU's
# default f32 matmul rounds the *feature* operand to bfloat16 (~3 decimal
# digits), so the gather is NOT bit-exact there by default — it is on CPU,
# and the conftest pins JAX_DEFAULT_MATMUL_PRECISION=highest for parity
# tests.  Measured on the real chip (B=256 LDPC step): forcing
# Precision.HIGHEST or HIGH on these einsums costs ~23% end-to-end
# throughput (126 -> 96 M edges/s), while training quality at the default
# is validated end-to-end (RESULTS.md), so the default stays fast and
# FGNN_GATHER_PRECISION=highest opts into bit-exact gathers (checkpoint-
# import parity evals want this).
#
# PRECONDITION: one-hot gathers require in-range indices.  Out-of-range or
# negative entries in ``nn_idx`` produce all-zero rows (the indexed gather
# would clamp instead), and Inf/NaN anywhere in ``x`` poisons every output
# row (0*Inf=NaN).  All fgnn_tpu tables are self-loop padded and therefore
# valid; enable FGNN_DEBUG_CHECK_IDX=1 / jax_debug_nans when in doubt.
_ONEHOT_MAX_SRC = int(os.environ.get("FGNN_ONEHOT_GATHER_MAX", "512"))
_GATHER_PRECISION = (
    jax.lax.Precision.HIGHEST
    if os.environ.get("FGNN_GATHER_PRECISION") == "highest" else None)
_DEBUG_CHECK_IDX = os.environ.get("FGNN_DEBUG_CHECK_IDX") == "1"
# Storage dtype for the gathered per-edge intermediate hg (Nd, K, B, C*T)
# — the largest tensor the step materializes (75-151 MB per conv at B=256).
# bf16 storage is numerically near-equivalent on TPU (the MXU rounds f32
# dot operands to bfloat16 on ingest anyway) but MEASURED SLOWER on v5e
# (15.8 vs 12.6 ms B=256 LDPC step: the (16,128) bf16 tiling of the
# minor (nout, T=4) split inflates padding and forces relayouts), so the
# default stays f32.  FGNN_GATHER_STORE=bf16 opts in for experiments.
_GATHER_STORE = os.environ.get("FGNN_GATHER_STORE")


def _gather_store_dtype(dtype, precision):
    if _GATHER_STORE == "bf16" and precision is None \
            and _GATHER_PRECISION is None:
        return jnp.bfloat16
    return jnp.float32 if dtype == jnp.float32 else dtype


def _check_idx(nn_idx, n_src: int):
    if _DEBUG_CHECK_IDX:
        import numpy as np

        idx = np.asarray(nn_idx)
        assert idx.min() >= 0 and idx.max() < n_src, (
            f"nn_idx out of range [0, {n_src}): min={idx.min()} max={idx.max()}")


def _concrete_idx(nn_idx):
    """Return nn_idx as a host numpy array when it is a trace-time constant
    (e.g. the LDPC global-factor tables built with jnp.zeros/arange inside
    the model), else None.  Concrete tables unlock exact structural
    shortcuts below that skip the one-hot gather matmul entirely.

    Tracer inputs are detected by the TracerArrayConversionError that
    ``np.asarray`` raises (the public-API contract), not by isinstance
    checks against deprecated ``jax.core`` internals."""
    try:
        import numpy as np

        return np.asarray(nn_idx)
    except Exception:
        return None


def _trivial_gather(h, idx_np, n_src: int):
    """Exact gathers that need no one-hot matmul, for concrete tables:

    * single source (n_src == 1): every edge reads row 0 -> broadcast
      (the LDPC global-factor f2v direction, train_ldpc.py:40-55);
    * identity cover (idx.ravel() == arange(n_src)): the edge grid is a
      pure reshape of the source rows (the global-factor v2f direction).

    Returns (B, Nd, K, M) or None when neither shortcut applies.  Both are
    bit-exact (a copy, not an MXU contraction).  The shortcuts validate the
    concrete table values (cheap trace-time numpy), so FGNN_DEBUG_CHECK_IDX
    semantics are preserved on these paths.
    """
    import numpy as np

    nd, k = idx_np.shape
    if n_src == 1:
        if not (idx_np == 0).all():
            _check_idx(idx_np, n_src)  # out-of-range table: fail loud in debug
            return None
        return jnp.broadcast_to(
            h[:, 0][:, None, None, :], (h.shape[0], nd, k, h.shape[-1]))
    if nd * k == n_src and np.array_equal(
            idx_np.reshape(-1), np.arange(n_src)):
        return h.reshape(h.shape[0], nd, k, h.shape[-1])
    return None


# ---------------------------------------------------------------------------
# Mixed-operator ("mixmat") formulation — measured comparison point only.
#
# The one-hot formulation materializes the gathered-and-untyped messages
# hg (Nd, K, B, nout*T) per conv; on the real chip the compiled step spends
# most of its HBM bandwidth writing, reading and LAYOUT-COPYING these
# tensors (profiled: ~1.8k async copy pairs, 100-151 MB each, per B=256
# LDPC train step).  Folding the neighbor gather and the edge-type mixing
# into ONE batched operand kills all of it:
#
#   A[b, (d k), (n t)] = onehot[d,k,n] * etype[b,d,k,t]       (built once,
#                                                              CSE'd across
#                                                              layers)
#   msgs[b, (d k), c]  = sum_{n,t} A[b,(dk),(nt)] * h[b,(nt),c]
#
# where h = x @ W_tmajor reshaped to (B, N*T, nout).  Everything is a
# batch-major batched matmul: natural TPU layouts end to end, zero
# transposes, and the backward (dA = dmsgs h^T, dh = A^T dmsgs) is also
# pure batched matmuls — no scatter, no layout copies.  The extra FLOPs
# (the n-contraction runs over N*T instead of T) are free in this
# bandwidth-bound regime.  Numerics: each (n,t) slot of A holds exactly
# one nonzero per t, so the contraction sums the same T products as the
# reference einsum (summation order differs -> ~1 ulp f32).
#
# MEASURED (v5e, B=128 LDPC step): 8.1 ms vs 5.7 ms for the k-major
# one-hot path below — the (B, E, N*T) x (B, N*T, C) contraction is a
# BATCHED matmul of tiny per-sample matrices, which starves the MXU
# (the one-hot path's gather is one large unbatched dot).  Kept opt-in
# (FGNN_MP_IMPL=mixmat) as the comparison point.
_MIXMAT_MAX_NT = int(os.environ.get("FGNN_MIXMAT_MAX_NT", "4096"))


def _mp_impl() -> str:
    return os.environ.get("FGNN_MP_IMPL", "onehot")


def _mixmat_supported(x, nn_idx, etype) -> bool:
    if jnp.ndim(nn_idx) != 2 or jnp.ndim(etype) != 4:
        return False
    n_src = x.shape[1]
    T = etype.shape[-1]
    return 0 < n_src * T <= _MIXMAT_MAX_NT


def _mixmat_operator(nn_idx, etype, n_src: int, dtype):
    """Build A (B, Nd*K, N*T) from the shared table + per-sample etype."""
    nd, k = nn_idx.shape
    B, _, _, T = etype.shape
    onehot = jax.nn.one_hot(nn_idx, n_src, dtype=dtype)        # (Nd, K, N)
    a = onehot[None, :, :, :, None] * etype[..., None, :].astype(dtype)
    return a.reshape(B, nd * k, n_src * T)


def _tmajor_filters(filters, cin_rows: int, nout: int, T: int, dtype):
    """Re-layout the reference filter bank (rows, nout*T) col=c*T+t into
    t-major columns col=t*nout+c, so x @ W reshapes to (B, N*T, nout)."""
    w = filters.reshape(cin_rows, nout, T)
    return jnp.transpose(w, (0, 2, 1)).reshape(cin_rows, T * nout).astype(dtype)


def _mixmat_conv(x, nn_idx, etype, filters, nout, *, extension,
                 aggregator, gamma, bias, precision):
    """typed_mp_conv via the mixed-operator formulation (all extensions)."""
    B, n_src, cin = x.shape
    nd, k = nn_idx.shape
    T = etype.shape[-1]
    dtype = x.dtype

    a_op = _mixmat_operator(nn_idx, etype, n_src, dtype)       # (B, E, N*T)

    if extension == Extension.NO_EXTENSION:
        wt = _tmajor_filters(filters, cin, nout, T, dtype)
        h = jnp.matmul(x, wt, precision=precision,
                       preferred_element_type=jnp.float32)     # (B, N, T*nout)
        h = h.reshape(B, n_src * T, nout)
        msgs = jnp.matmul(a_op, h, precision=precision,
                          preferred_element_type=jnp.float32)  # (B, E, nout)
        msgs = msgs.reshape(B, nd, k, nout)
    else:
        # [x_i ; x_i - x_j] W = x_i (W_self + W_nbr) - x_j W_nbr  (DIFF)
        # [x_i ;       x_j] W = x_i W_self           + x_j W_nbr  (NEIGHBOR)
        # The self term needs no gather: contract etype directly; only the
        # neighbor term rides the A operator.  Requires N_dst == N_src.
        w_self = filters[:cin]
        w_nbr = filters[cin:]
        if extension == Extension.ORIG_WITH_DIFF:
            wa = _tmajor_filters(w_self + w_nbr, cin, nout, T, dtype)
            sign = -1.0
        elif extension == Extension.ORIG_WITH_NEIGHBOR:
            wa = _tmajor_filters(w_self, cin, nout, T, dtype)
            sign = 1.0
        else:
            raise ValueError(f"unknown extension {extension}")
        wb = _tmajor_filters(w_nbr, cin, nout, T, dtype)
        ha = jnp.matmul(x, wa, precision=precision,
                        preferred_element_type=jnp.float32)    # (B, N, T*nout)
        hb = jnp.matmul(x, wb, precision=precision,
                        preferred_element_type=jnp.float32)
        nbr = jnp.matmul(a_op, hb.reshape(B, n_src * T, nout),
                         precision=precision,
                         preferred_element_type=jnp.float32)   # (B, E, nout)
        ha = ha.reshape(B, nd, T, nout)
        self_t = jnp.einsum("bnkt,bntc->bnkc", etype.astype(dtype), ha,
                            precision=precision,
                            preferred_element_type=jnp.float32)
        msgs = self_t + sign * nbr.reshape(B, nd, k, nout)

    out = aggregate(msgs, aggregator, gamma)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def gather_nodes(x: jax.Array, nn_idx: jax.Array) -> jax.Array:
    """Gather per-edge source features.

    x:      (B, N_src, C)
    nn_idx: (N_dst, K) shared across batch, or (B, N_dst, K) per-sample.
    returns (B, N_dst, K, C)

    Indices must lie in [0, N_src) — see the one-hot precondition above.
    """
    if nn_idx.ndim == 2:
        n_src = x.shape[1]
        if 0 < n_src <= _ONEHOT_MAX_SRC:
            _check_idx(nn_idx, n_src)
            onehot = jax.nn.one_hot(nn_idx, n_src, dtype=x.dtype)
            return jnp.einsum("dkn,bnc->bdkc", onehot, x,
                              precision=_GATHER_PRECISION)
        return x[:, nn_idx]
    if nn_idx.ndim == 3:
        return jax.vmap(lambda xb, ib: xb[ib])(x, nn_idx)
    raise ValueError(f"nn_idx must be rank 2 or 3, got {nn_idx.shape}")


def aggregate(msgs: jax.Array, aggregator: str, gamma: float = 3.0,
              axis: int = 2) -> jax.Array:
    """Aggregate per-edge messages over the neighbor axis K.

    msgs: (B, N, K, C) -> (B, N, C) by default (matches mp_nn.py:68-90);
    ``axis`` selects K for other layouts.
    """
    if aggregator == "max":
        return jnp.max(msgs, axis=axis)
    if aggregator == "softmax":
        # (1/gamma) * logsumexp(gamma * x) over K  (mp_nn.py:79-85)
        return (1.0 / gamma) * jax.nn.logsumexp(gamma * msgs, axis=axis)
    if aggregator == "mean":
        return jnp.mean(msgs, axis=axis)
    if aggregator == "sum":
        return jnp.sum(msgs, axis=axis)
    raise ValueError(f"unknown aggregator {aggregator!r}")


def typed_mp_conv(
    x: jax.Array,
    nn_idx: jax.Array,
    etype: jax.Array,
    filters: jax.Array,
    nout: int,
    *,
    extension: Extension = Extension.NO_EXTENSION,
    aggregator: str = "softmax",
    gamma: float = 3.0,
    bias: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    """The full typed-edge graph conv (without norm/activation).

    x:       (B, N_src, C_in)
    nn_idx:  (N_dst, K) or (B, N_dst, K), int
    etype:   (B, N_dst, K, T) per-edge type-weight vectors
    filters: (C_in, nout*T) for NO_EXTENSION, (2*C_in, nout*T) otherwise;
             column layout c_out * T + t (matches reference mp_nn.py:124-159)
    bias:    (nout,) optional, added AFTER aggregation (mp_nn.py:165-168)
    returns  (B, N_dst, nout)
    """
    T = etype.shape[-1]
    dtype = x.dtype

    if extension == Extension.NO_EXTENSION:
        n_src = x.shape[1]
        idx_np = _concrete_idx(nn_idx) if jnp.ndim(nn_idx) == 2 else None

        if idx_np is not None:
            # trivial concrete tables (broadcast / identity cover) stay on
            # the exact zero-matmul shortcut — cheaper than any kernel
            h = jnp.matmul(x, filters.astype(dtype), precision=precision,
                           preferred_element_type=jnp.float32)
            hg = _trivial_gather(h, idx_np, n_src)
            if hg is not None:
                hg = hg.reshape(*hg.shape[:-1], nout, T)
                et = etype.astype(dtype)
                if T == 1:
                    # the LDPC global-factor convs: a 1-type "mix" is a
                    # plain elementwise scale — an einsum here lowers to a
                    # dot_general batched over (b, n, k), which the TPU
                    # executes as a storm of tiny dots
                    msgs = hg[..., 0] * et
                else:
                    # multiply + reduce fuses on the VPU (no batched dot)
                    msgs = jnp.sum(hg * et[..., None, :], axis=-1)
                out = aggregate(msgs, aggregator, gamma)
                if bias is not None:
                    out = out + bias.astype(out.dtype)
                return out

        if idx_np is not None and _use_fused():
            from .fused_mp import fused_supported, fused_typed_mp

            fprec = ("float32" if precision == jax.lax.Precision.HIGHEST
                     or _GATHER_PRECISION is not None else None)
            spmd_out = _spmd_fused_call(
                x, nn_idx, etype, filters, nout, extension_name="none",
                aggregator=aggregator, gamma=gamma, bias=bias,
                precision=fprec)
            if spmd_out is not None:
                return spmd_out
            if fused_supported(x.shape, jnp.shape(nn_idx), etype.shape,
                               aggregator, nout=nout):
                return fused_typed_mp(
                    x, nn_idx, etype, filters, nout, aggregator=aggregator,
                    gamma=gamma, bias=bias, precision=fprec)

        # Transform at the source (N_src rows), then gather the (nout*T)-dim
        # rows — cheaper than per-edge matmuls whenever K > 1, and the same
        # contraction order as the reference (mp_nn.py:124-134).
        h = jnp.matmul(x, filters.astype(dtype), precision=precision,
                       preferred_element_type=jnp.float32)

        if _mp_impl() == "mixmat" and _mixmat_supported(x, nn_idx, etype):
            return _mixmat_conv(
                x, nn_idx, etype, filters, nout, extension=extension,
                aggregator=aggregator, gamma=gamma, bias=bias,
                precision=precision)
        if jnp.ndim(nn_idx) == 2 and 0 < n_src <= _ONEHOT_MAX_SRC:
            # One-hot MXU gather kept in the dot's NATURAL output layout
            # (Nd, K, B, C): forcing (B, Nd, K, C) here makes XLA insert a
            # whole-activation transpose copy (hundreds of MB per layer);
            # instead only the small aggregated (Nd, B, C) result is
            # transposed back at the end.
            #
            # Two further formulations were measured SLOWER on v5e (B=128/
            # 256 LDPC step) and rejected:
            #   * k-major free dims + t-major filters + mul-reduce etype
            #     mixing (7.5/18.0 ms vs 5.7/12.0) — the (.., T, C) reshape
            #     half-fills lanes at C=64 and the t-reduce defeats the
            #     dot's natural tiling;
            #   * the batched mixed-operator path (_mixmat_conv above).
            _check_idx(nn_idx, n_src)
            store = _gather_store_dtype(dtype, precision)
            onehot = jax.nn.one_hot(nn_idx, n_src, dtype=dtype)
            # NOTE (measured on v5e, B=256 LDPC step): pre-transposing x to
            # source-major (N, B, C) so this dot contracts the leading rhs
            # axis was tried and is SLOWER (14.1 vs 12.5 ms) — XLA already
            # handles the (B, N, M) operand better than an explicit
            # transpose-first formulation.  Keep the dot-natural layout.
            hg = jnp.einsum("dkn,bnm->dkbm", onehot, h,
                            precision=(precision or _GATHER_PRECISION),
                            preferred_element_type=store)
            hg = hg.reshape(*hg.shape[:-1], nout, T)
            et = jnp.transpose(etype.astype(store), (1, 2, 0, 3))  # (Nd,K,B,T)
            msgs = jnp.einsum("dkbct,dkbt->dkbc", hg, et,
                              precision=precision,
                              preferred_element_type=jnp.float32)
            out = aggregate(msgs, aggregator, gamma, axis=1)       # (Nd,B,C)
            out = jnp.transpose(out, (1, 0, 2))                    # (B,Nd,C)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

        h = h.reshape(*h.shape[:-1], nout, T)
        hg = gather_nodes(h.reshape(*h.shape[:-2], nout * T), nn_idx)
        hg = hg.reshape(*hg.shape[:-1], nout, T)
        msgs = jnp.einsum("bnkct,bnkt->bnkc", hg, etype.astype(dtype),
                          precision=precision,
                          preferred_element_type=jnp.float32)
    else:
        ext_name = ("diff" if extension == Extension.ORIG_WITH_DIFF
                    else "neighbor")
        if _use_fused() and jnp.ndim(nn_idx) == 2 \
                and _concrete_idx(nn_idx) is not None:
            from .fused_mp import fused_supported, fused_typed_mp

            fprec = ("float32" if precision == jax.lax.Precision.HIGHEST
                     or _GATHER_PRECISION is not None else None)
            spmd_out = _spmd_fused_call(
                x, nn_idx, etype, filters, nout, extension_name=ext_name,
                aggregator=aggregator, gamma=gamma, bias=bias,
                precision=fprec)
            if spmd_out is not None:
                return spmd_out
            if fused_supported(x.shape, jnp.shape(nn_idx), etype.shape,
                               aggregator, extension_name=ext_name,
                               nout=nout):
                return fused_typed_mp(
                    x, nn_idx, etype, filters, nout, extension=ext_name,
                    aggregator=aggregator, gamma=gamma, bias=bias,
                    precision=fprec)
        if (_mp_impl() == "mixmat" and _mixmat_supported(x, nn_idx, etype)
                and nn_idx.shape[0] == x.shape[1]):
            return _mixmat_conv(
                x, nn_idx, etype, filters, nout, extension=extension,
                aggregator=aggregator, gamma=gamma, bias=bias,
                precision=precision)
        # Edge input [x_i ; x_i - x_j] (DIFF) or [x_i ; x_j] (NEIGHBOR)
        # (mp_nn.py:136-159). Requires N_dst == N_src.
        #
        # Split the 2C-row filter bank W = [W_self ; W_nbr] and use
        #   [x_i ; x_i - x_j] W = x_i (W_self + W_nbr) - x_j W_nbr
        #   [x_i ;       x_j] W = x_i W_self          + x_j W_nbr
        # so the matmuls run once per NODE (not per edge, a K-fold FLOP
        # saving) and the edge stage is gather + add, like NO_EXTENSION.
        cin = x.shape[-1]
        w_self = filters[:cin].astype(dtype)
        w_nbr = filters[cin:].astype(dtype)
        if extension == Extension.ORIG_WITH_DIFF:
            a = jnp.matmul(x, w_self + w_nbr, precision=precision,
                           preferred_element_type=jnp.float32)
            sign = -1.0
        elif extension == Extension.ORIG_WITH_NEIGHBOR:
            a = jnp.matmul(x, w_self, precision=precision,
                           preferred_element_type=jnp.float32)
            sign = 1.0
        else:
            raise ValueError(f"unknown extension {extension}")
        b = jnp.matmul(x, w_nbr, precision=precision,
                       preferred_element_type=jnp.float32)
        bg = gather_nodes(b, nn_idx)                      # (B, N, K, nout*T)
        h = a[:, :, None, :] + sign * bg
        h = h.reshape(*h.shape[:-1], nout, T)             # (B, N, K, nout, T)
        msgs = jnp.einsum("bnkct,bnkt->bnkc", h, etype.astype(dtype),
                          precision=precision,
                          preferred_element_type=jnp.float32)

    out = aggregate(msgs, aggregator, gamma)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
