"""Fused Pallas TPU kernel for the typed message-passing conv (v2).

Fuses the neighbor gather, edge-type mixing and K-aggregation of the
NO_EXTENSION typed conv (reference math:
/root/reference/lib/model/mpnn/mp_nn.py:115-175) into VMEM-resident
kernels with a custom VJP, so the gathered per-edge tensor
``hg (Nd, K, B, C*T)`` — 75-151 MB per conv at the flagship LDPC config,
and the dominant HBM traffic of the XLA lowering — never exists in HBM,
in either the forward or the backward pass.

v2 design (replaces the round-3 per-sample kernel, which lost to XLA —
15.7 vs 12.8 ms — because each grid program ran 8 serialized per-sample
matmuls):

  * **Lane-batched**: a tile of ``bT`` batch elements rides the LANE
    dimension of every matmul.  The gather is ``onehot (E, N) @
    h_t (N, bT*C)`` — one MXU dot per edge type per tile covering the
    whole tile, not per-sample loops.
  * **2D-only Mosaic surface**: every in-kernel array is 2D or indexed
    down to 2D by a leading index; no reshapes of vector values (the
    operation Mosaic restricts).  Layouts are prepared outside by XLA
    (cheap (T, N, B*C) / (T, E, B) transposes that stay inside the
    autodiff graph).
  * **Recompute backward**: the backward kernel recomputes the per-edge
    messages in VMEM instead of saving them, then emits d_h and d_etype
    with two more dot groups.  The per-edge-type gradient's segmented
    sum over channels runs ON THE MXU via a 0/1 segment matrix.
  * ``h = x @ W`` stays OUTSIDE the kernel: XLA computes it as one large
    dot and differentiates it (dW, dx) for free.

Edge rows are K-MAJOR (row k*Nd + d) so the K-aggregation is a loop of
leading-dim slices.  Matmuls use bf16 operands with f32 accumulation by
default — identical numerics to the XLA path's default TPU matmul
precision — and f32 when ``precision='float32'`` (parity tests; CPU
interpret mode).

Max-tie gradient semantics: on EXACT message ties the backward routes the
whole cotangent to the first-winning k slot (the forward-saved first-win
argmax), while the XLA fallback's ``jnp.max`` VJP splits it evenly among
tied slots.  Both are valid subgradients of the same function and the
event is measure-zero with continuous features; the divergence is
documented (and asserted) in tests/test_fused_mp.py
``test_max_tie_gradient_semantics``.

SPMD: the kernel itself has no partitioning rule.  Multi-device runs wrap
it in ``jax.shard_map`` over the batch axis via
``fgnn_tpu.ops.typed_mp._spmd_fused_call`` (the dispatcher consults the
mesh registered by ``prepare_mesh_training``), so mesh training keeps the
fused kernel instead of falling back to the XLA path.
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


_HG_STORE_CAP = 4 << 20  # keep the recomputed hg_all only when it fits


def _store_hg(bt: int, C: int, T: int, E: int) -> bool:
    """Whether the backward keeps all T recomputed hg chunks in VMEM
    (saves T gather dots) or recomputes each hg_t in the gradient loop
    (large T*E configurations, e.g. the 16-edge-type synthetic models)."""
    return 2 * T * E * bt * C <= _HG_STORE_CAP


def _bwd_bytes(bt: int, C: int, T: int, E: int, Ns: int, Nd: int,
               aggregator: str = "softmax", mm_b: int = 2) -> int:
    """VMEM bytes of the backward tile — PHYSICAL accounting (r5).

    Two aggregator-aware effects matter:
      * max/sum/mean never materialize the recomputed messages, so their
        edge scratch is just dm (E, bTC) in the matmul dtype — no msgs,
        no hg_all store — which is what lets several flagship shapes run
        32-wide tiles where softmax needs 16;
      * every STREAMED block (h5/dh, g, amax for max, et/det) is counted
        TWICE: Mosaic double-buffers grid-varying blocks.  The r4 formula
        omitted this (plus amax and the et/det blocks entirely), which
        let wide tiles through that really cost 22.7-23.5 MB against the
        16 MB scoped limit.

    Calibration (real Mosaic footprints vs this estimate, B=256 LDPC
    shapes, r5 stream dtypes g=mm/amax=bf16 — the est-to-real ratio is
    ~1.2-1.3, which the cap accounts for):
      f2v C=128 bt=32 max -> est 11.95 MB, real 19.71 MB
      f2v C=64  bt=64 max -> est ~17 MB,   real 23.49 MB
    Under the r4-era DEFAULT 16 MB scoped limit both were OOMs; the
    kernels now request a raised per-call limit (_VMEM_LIMIT below) and
    the cap instead bounds total per-kernel VMEM to ~60 MB real.
    """
    bTC = bt * C
    g_b = 4 if aggregator == "softmax" else mm_b           # g: f32 / mm
    streamed = (2 * mm_b * T * Ns * bTC                    # h5 + dh, mm
                + g_b * Nd * bTC
                + (2 * Nd * bTC if aggregator == "max" else 0)  # amax, bf16
                + 2 * 4 * T * bt * E)                      # et + det, f32
    if aggregator == "softmax":
        hg = 2 * T * E * bTC if _store_hg(bt, C, T, E) else 0
        scratch = hg + (4 + 4) * E * bTC                   # msgs + dm, f32
    else:
        scratch = mm_b * E * bTC                           # dm, mm dtype
    return 2 * streamed + scratch + mm_b * 2 * E * _round_up(Ns, _LANE)


# VMEM policy (r5, final): Mosaic's per-kernel scoped-VMEM limit
# defaults to 16 MB but is SETTABLE per pallas_call
# (CompilerParams.vmem_limit_bytes); the kernels request _VMEM_LIMIT.
# Measured findings from the wide-tile sweep (all on the real chip,
# B=256 flagship step):
#   * wide-everywhere (48 MB cap, doubled fwd tiles, 100 MB limit):
#     REGRESSION — f32 175.6 -> ~160, bf16 199.7 -> ~182 M edges/s;
#   * isolated microbench: only the lean f2v-class C=64 backward wins
#     from bt=64 (0.202 -> 0.049 ms fwd+bwd); v2f/C=128 are flat to
#     slightly worse;
#   * the selective policy below (bt=64 only for that class, minimal
#     28 MB limit, fwd tiles unchanged) measures NEUTRAL end to end
#     (f32 ~175, bf16 ~196-199) — kept because it never hurts, the
#     isolated win may matter at other batch shapes, and the limit
#     machinery documents a real Mosaic tuning surface.
import os as _os

# 28 MB: just enough for the 64-wide tile's ~23.5 MB real footprint.
# 100 MB was measured and REJECTED: reserving a large scoped window
# starves the surrounding XLA ops of VMEM and costs ~8% end to end
# (f32 175.6 -> ~160 M edges/s).
_VMEM_LIMIT = int(_os.environ.get("FGNN_VMEM_LIMIT_MB", "28")) << 20
_VMEM_EST_CAP = 9 << 20
# 17 MB: admits the C=128 32-wide tiles (ests 11.95/16.45 MB -> ~20-22 MB
# real, inside the 28 MB window), which measure 17-27% faster than their
# 16-wide tiles under this window (f2v128 0.475 -> 0.345 ms fwd+bwd)
_BWD_EST_CAP = 17 << 20
# 13 MB selects exactly the measured-win class (f2v-lean est 12.5 MB;
# v2f est 17.0 MB measured flat-to-worse at 64)
_BWD_WIDE_CAP = 13 << 20


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _batch_tile(B: int, C: int, T: int, E: int, Ns: int, Nd: int,
                aggregator: str = "softmax", mm_b: int = 2) -> int:
    """Backward batch tile (see the VMEM policy note above).

    TPU block rules additionally need bT >= 8 and bT*C lane-aligned;
    callers treat a return of 1 as unsupported."""
    if (B % 64 == 0 and 64 * C <= 4096 and
            _bwd_bytes(64, C, T, E, Ns, Nd, aggregator, mm_b)
            <= _BWD_WIDE_CAP):
        return 64
    for bt in (32, 16, 8):
        if (B % bt == 0 and bt * C <= 4096 and bt * C % _LANE == 0
                and _bwd_bytes(bt, C, T, E, Ns, Nd, aggregator, mm_b)
                <= _BWD_EST_CAP):
            return bt
    return 1


def _fwd_tile(B: int, C: int, T: int, E: int, Ns: int, Nd: int) -> int:
    """The forward working set is much leaner (h block + msgs + out), so
    it can run wider tiles than the backward — fewer, larger MXU dots."""
    for bt in (64, 32, 16, 8):
        bytes_ = (2 * T * Ns + 4 * 2 * E + 4 * Nd) * bt * C
        if (B % bt == 0 and bt * C <= 8192 and bt * C % _LANE == 0
                and bytes_ <= _VMEM_EST_CAP):
            return bt
    return 1


def fused_supported(x_shape, nn_idx_shape, etype_shape, aggregator: str,
                    extension_name: str = "none", nout: int = 128) -> bool:
    """Whether the fused kernel covers this conv instance."""
    if extension_name not in ("none", "diff", "neighbor"):
        return False
    if len(nn_idx_shape) != 2 or len(x_shape) != 3 or len(etype_shape) != 4:
        return False
    if aggregator not in ("max", "mean", "sum", "softmax"):
        return False
    B, Ns, Cin = x_shape
    Nd, K = nn_idx_shape
    T = etype_shape[-1]
    # Extensions stack [onehot(dst) | onehot(src)] over a doubled source
    # block, and self terms index x by destination — needs Nd <= Ns.
    n_eff = Ns if extension_name == "none" else 2 * Ns
    if extension_name != "none" and Nd > Ns:
        return False
    if K > 16 or T > 16 or n_eff > 1024 or B < 1:
        return False
    E = Nd * K
    return _batch_tile(B, nout, T, E, n_eff, Nd, aggregator) >= 8


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _prec(mm_dtype):
    """MXU precision for in-kernel dots: default (bf16 operand rounding)
    for the production bf16 mode; HIGHEST (multi-pass decomposition) when
    mm_dtype is f32 so precision='float32' is genuinely f32-accurate on
    the real chip, not just f32-stored (r5 — the on-chip parity check's
    Mosaic-exactness criterion depends on this)."""
    import jax as _jax

    return (_jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else None)


def _seg_mats(bT, C, mm_dtype):
    """The 0/1 batch<->lane segment matrices, built in-VREG from iota:
    segt (bT, bT*C) expands per-batch scalars to their C lanes (via MXU),
    seg (bT*C, bT) is its transpose for segmented channel sums.
    pltpu.repeat is a TILE repeat, not an element repeat, so it cannot
    build this layout."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bT, bT * C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bT, bT * C), 1)
    segt = (cols // C == rows).astype(mm_dtype)
    return segt, segt.T


def _expand(et_t, segt, mm_dtype):
    """(E, bT) -> (E, bT*C): repeat each batch lane C times (c-minor)."""
    return jax.lax.dot(et_t.astype(mm_dtype), segt,
                       precision=_prec(mm_dtype),
                       preferred_element_type=jnp.float32)


def _fwd_kernel(oh_ref, h_ref, et_ref, out_ref, amax_ref, msgs,
                *, Nd, K, T, C, bT, aggregator, gamma, mm_dtype):
    """One program = bT batch rows across the lane dim.

    oh_ref: (E, N) k-major rows   h_ref: (T, N, bT*C)   et_ref: (T, bT, E)
    out_ref: (Nd, bT*C)           scratch msgs: (E, bT*C) f32

    et rides batch-second-minor (TPU block rule: last two block dims must
    be (8,128)-divisible or full; (bT, E) satisfies it, (E, bT) cannot)
    and is transposed to (E, bT) in-VREG before the expansion dot.
    """
    oh = oh_ref[...].astype(mm_dtype)
    segt, _ = _seg_mats(bT, C, mm_dtype)
    for t in range(T):
        hg_t = jax.lax.dot(oh, h_ref[t].astype(mm_dtype),
                           precision=_prec(mm_dtype),
                           preferred_element_type=jnp.float32)
        term = hg_t * _expand(et_ref[t].T, segt, mm_dtype)
        if t == 0:
            msgs[...] = term
        else:
            msgs[...] += term

    if aggregator == "max":
        # first-win argmax: the backward reuses it instead of recomputing
        # the whole message tensor.  Stored bfloat16 (K <= 16 is exact):
        # half the i32 stream the r4 kernel shipped to HBM and back.
        # int8 (a quarter) was tried and CRASHES the Mosaic compiler at
        # these block shapes (tpu_compile_helper exit 1, r5).
        acc = msgs[0:Nd]
        am = jnp.zeros_like(acc, dtype=jnp.int32)
        for k in range(1, K):
            blk = msgs[k * Nd:(k + 1) * Nd]
            take = blk > acc
            acc = jnp.where(take, blk, acc)
            am = jnp.where(take, k, am)
        amax_ref[...] = am.astype(amax_ref.dtype)
    elif aggregator in ("sum", "mean"):
        acc = msgs[0:Nd]
        for k in range(1, K):
            acc = acc + msgs[k * Nd:(k + 1) * Nd]
        if aggregator == "mean":
            acc = acc * (1.0 / K)
    else:  # softmax: (1/g) * logsumexp(g * m) over k
        mx = msgs[0:Nd]
        for k in range(1, K):
            mx = jnp.maximum(mx, msgs[k * Nd:(k + 1) * Nd])
        s = jnp.zeros_like(mx)
        for k in range(K):
            s = s + jnp.exp(gamma * (msgs[k * Nd:(k + 1) * Nd] - mx))
        acc = mx + jnp.log(s) * (1.0 / gamma)
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_kernel(g_ref, oh_ref, oht_ref, h_ref, et_ref, amax_ref,
                dh_ref, det_ref, hg_all, msgs, dm,
                *, Nd, K, T, C, bT, aggregator, gamma, mm_dtype, store_hg):
    """Recompute + backward.  One program = bT batch rows.

    g_ref: (Nd, bT*C)  oht_ref: (N, E)  amax_ref: (Nd, bT*C) i32
    dh_ref: (T, N, bT*C)  det_ref: (T, bT, E)
    scratch: hg_all (T*E, bT*C) f32, msgs (E, bT*C) f32, dm (E, bT*C) f32

    For max (forward-saved argmax), sum and mean, the aggregation
    cotangent needs no message values, so the forward-recompute pass is
    SKIPPED; hg_t is recomputed per t in the gradient loop (2T gather
    dots total instead of 3T).  softmax still recomputes the messages
    (its weights need them).
    """
    E = Nd * K
    oh = oh_ref[...].astype(mm_dtype)
    segt, seg = _seg_mats(bT, C, mm_dtype)

    need_msgs = aggregator == "softmax"
    if need_msgs:
        # ---- recompute per-edge messages (keeping each hg_t for d_etype
        # when the scratch fits, else recomputed in the loop below)
        for t in range(T):
            hg_t = jax.lax.dot(oh, h_ref[t].astype(mm_dtype),
                               precision=_prec(mm_dtype),
                               preferred_element_type=jnp.float32)
            if store_hg:
                hg_all[t * E:(t + 1) * E] = hg_t.astype(hg_all.dtype)
            term = hg_t * _expand(et_ref[t].T, segt, mm_dtype)
            if t == 0:
                msgs[...] = term
            else:
                msgs[...] += term

    # g arrives in the matmul dtype for max/sum/mean (the dots round dm to
    # it anyway; halving the stream is free) and f32 for softmax
    g = g_ref[...].astype(jnp.float32)  # (Nd, bT*C)

    # ---- aggregation cotangent dm (E, bT*C).  For max/sum/mean dm rides
    # the matmul dtype (the dots round it anyway; halving its bytes is
    # what buys the wider tile); softmax keeps f32.
    if aggregator == "max":
        # amax streams bf16 (exact for K <= 16); upcast before comparing —
        # a bf16 equality predicate crashes the Mosaic compiler (r5)
        am = amax_ref[...].astype(jnp.float32)
        for k in range(K):
            dm[k * Nd:(k + 1) * Nd] = jnp.where(am == float(k), g,
                                                0.0).astype(dm.dtype)
    elif aggregator == "sum":
        for k in range(K):
            dm[k * Nd:(k + 1) * Nd] = g.astype(dm.dtype)
    elif aggregator == "mean":
        gs = (g * (1.0 / K)).astype(dm.dtype)
        for k in range(K):
            dm[k * Nd:(k + 1) * Nd] = gs
    else:  # softmax
        mx = msgs[0:Nd]
        for k in range(1, K):
            mx = jnp.maximum(mx, msgs[k * Nd:(k + 1) * Nd])
        s = jnp.zeros_like(mx)
        for k in range(K):
            s = s + jnp.exp(gamma * (msgs[k * Nd:(k + 1) * Nd] - mx))
        lse = mx + jnp.log(s) * (1.0 / gamma)
        for k in range(K):
            dm[k * Nd:(k + 1) * Nd] = g * jnp.exp(
                gamma * (msgs[k * Nd:(k + 1) * Nd] - lse))

    # ---- d_etype[t, e, b] = sum_c dm[e, bC+c] * hg_t[e, bC+c]
    # The segmented channel sum runs on the MXU against the 0/1 block
    # matrix seg (bT*C, bT): column b is 1 exactly on its C lanes.
    oht = oht_ref[...].astype(mm_dtype)
    for t in range(T):
        if need_msgs and store_hg:
            hg_t = hg_all[t * E:(t + 1) * E]
        else:
            hg_t = jax.lax.dot(oh, h_ref[t].astype(mm_dtype),
                               precision=_prec(mm_dtype),
                               preferred_element_type=jnp.float32)
        prod = (dm[...] * hg_t).astype(mm_dtype)
        det_ref[t] = jax.lax.dot(
            prod, seg, precision=_prec(mm_dtype),
            preferred_element_type=jnp.float32
        ).T.astype(det_ref.dtype)
        # ---- dh_t = onehot^T @ (dm * et_t)
        q = (dm[...] * _expand(et_ref[t].T, segt, mm_dtype)).astype(mm_dtype)
        dh_ref[t] = jax.lax.dot(
            oht, q, precision=_prec(mm_dtype),
            preferred_element_type=jnp.float32
        ).astype(dh_ref.dtype)


# ---------------------------------------------------------------------------
# custom-vjp wrapper over (h5, et3)
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_fwd_impl(h5, et3, oh, oht, nout, aggregator, gamma,
                    mm_dtype_name, Nd, K, bT, bTf,
                    out_dtype_name="float32"):
    bT = bTf  # the forward runs its own (wider) tile
    T, N, BC = h5.shape
    E = Nd * K
    C = nout
    mm_dtype = jnp.dtype(mm_dtype_name)
    kern = functools.partial(
        _fwd_kernel, Nd=Nd, K=K, T=T, C=C, bT=bT,
        aggregator=aggregator, gamma=gamma, mm_dtype=mm_dtype)
    out, amax = pl.pallas_call(
        kern,
        grid=(BC // (bT * C),),
        in_specs=[
            pl.BlockSpec((E, N), lambda i: (0, 0)),
            pl.BlockSpec((T, N, bT * C), lambda i: (0, 0, i)),
            pl.BlockSpec((T, bT, E), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Nd, bT * C), lambda i: (0, i)),
            pl.BlockSpec((Nd, bT * C), lambda i: (0, i)),
        ],
        out_shape=[
            # out rides the COMPUTE-POLICY dtype: under the bf16 policy the
            # downstream transpose/bias/norm consume bf16 anyway, so the
            # f32->bf16 round moves before the layout pass (same values,
            # half the bytes)
            jax.ShapeDtypeStruct((Nd, BC), jnp.dtype(out_dtype_name)),
            jax.ShapeDtypeStruct((Nd, BC), jnp.bfloat16),  # argmax, K <= 16
        ],
        scratch_shapes=[pltpu.VMEM((E, bT * C), jnp.float32)],
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(oh, h5, et3)
    return out, amax


def _fused_bwd_impl(h5, et3, oh, oht, amax, nout, aggregator, gamma,
                    mm_dtype_name, Nd, K, bT, bTf, g):
    T, N, BC = h5.shape
    E = Nd * K
    C = nout
    mm_dtype = jnp.dtype(mm_dtype_name)
    store_hg = _store_hg(bT, C, T, E)
    kern = functools.partial(
        _bwd_kernel, Nd=Nd, K=K, T=T, C=C, bT=bT,
        aggregator=aggregator, gamma=gamma, mm_dtype=mm_dtype,
        store_hg=store_hg)
    dh5, det3 = pl.pallas_call(
        kern,
        grid=(BC // (bT * C),),
        in_specs=[
            pl.BlockSpec((Nd, bT * C), lambda i: (0, i)),
            pl.BlockSpec((E, N), lambda i: (0, 0)),
            pl.BlockSpec((N, E), lambda i: (0, 0)),
            pl.BlockSpec((T, N, bT * C), lambda i: (0, 0, i)),
            pl.BlockSpec((T, bT, E), lambda i: (0, i, 0)),
            pl.BlockSpec((Nd, bT * C), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((T, N, bT * C), lambda i: (0, 0, i)),
            pl.BlockSpec((T, bT, E), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, BC), h5.dtype),
            jax.ShapeDtypeStruct((T, et3.shape[1], E), et3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((T * E if (aggregator == "softmax" and store_hg)
                        else 8, bT * C), mm_dtype),
            # msgs is only consumed by the softmax backward; max/sum/mean
            # get a stub so the freed VMEM buys the wider tile
            pltpu.VMEM((E if aggregator == "softmax" else 8, bT * C),
                       jnp.float32),
            pltpu.VMEM((E, bT * C),
                       jnp.float32 if aggregator == "softmax" else mm_dtype),
        ],
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(g, oh, oht, h5, et3, amax)
    return dh5, det3


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _fused(h5, et3, oh, oht, nout, aggregator, gamma,
           mm_dtype_name, Nd, K, bT, bTf, out_dtype_name):
    out, _ = _fused_fwd_impl(h5, et3, oh, oht, nout, aggregator,
                             gamma, mm_dtype_name, Nd, K, bT, bTf,
                             out_dtype_name)
    return out


def _fused_fwd(h5, et3, oh, oht, nout, aggregator, gamma,
               mm_dtype_name, Nd, K, bT, bTf, out_dtype_name):
    out, amax = _fused_fwd_impl(h5, et3, oh, oht, nout, aggregator,
                                gamma, mm_dtype_name, Nd, K, bT, bTf,
                                out_dtype_name)
    return out, (h5, et3, oh, oht, amax)


def _fused_bwd(nout, aggregator, gamma, mm_dtype_name, Nd, K, bT, bTf,
               out_dtype_name, res, g):
    h5, et3, oh, oht, amax = res
    if aggregator != "softmax":
        # the backward rounds dm to the matmul dtype anyway — casting the
        # cotangent OUTSIDE the kernel fuses into its producer transpose
        # and halves the g stream
        g = g.astype(jnp.dtype(mm_dtype_name))
    dh5, det3 = _fused_bwd_impl(h5, et3, oh, oht, amax, nout,
                                aggregator, gamma, mm_dtype_name, Nd, K,
                                bT, bTf, g)
    return (dh5.astype(h5.dtype), det3, jnp.zeros_like(oh),
            jnp.zeros_like(oht))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_typed_mp(
    x: jax.Array,
    nn_idx: jax.Array,
    etype: jax.Array,
    filters: jax.Array,
    nout: int,
    *,
    extension: str = "none",
    aggregator: str = "max",
    gamma: float = 3.0,
    bias: Optional[jax.Array] = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """Drop-in fused replacement for the typed_mp_conv shared-table path.

    x (B, N_src, Cin), nn_idx (Nd, K) shared, etype (B, Nd, K, T),
    filters (Cin, nout*T) — or (2*Cin, nout*T) for the extensions — in
    the reference column layout c*T+t.

    Extensions ride the SAME kernel: [x_i ; x_i - x_j] W splits into
    x_i (W_self + W_nbr) - x_j W_nbr (typed_mp.py), which the kernel
    evaluates as ONE gather dot against a stacked operand —
    oh2 = [onehot(dst) | onehot(src)] (E, 2N) contracted with
    [h_a ; sign * h_b] (2N, bT*C) — so dst-self terms and neighbor terms
    come out of the same MXU contraction.

    ``precision='float32'`` keeps in-kernel matmuls at f32 (parity tests);
    the default uses bf16 operands with f32 accumulation, matching the
    XLA path's default TPU matmul precision.
    """
    import numpy as np

    B, N, Cin = x.shape
    Nd, K = nn_idx.shape
    T = etype.shape[-1]
    C = nout
    n_eff = N if extension == "none" else 2 * N
    mm_b_tile = 4 if (precision == "float32" and not _interpret()) else 2
    bT = _batch_tile(B, C, T, Nd * K, n_eff, Nd, aggregator, mm_b_tile)
    # forward and backward tiles are independent pallas_calls over the
    # same (Nd, B*C) block grid; each picks its own largest-fitting tile
    # (the r5 aggregator-aware backward can now be WIDER than the forward)
    bTf = _fwd_tile(B, C, T, Nd * K, n_eff, Nd)
    if bTf < 8:
        bTf = bT
    mm_dtype_name = ("float32" if (precision == "float32" or _interpret())
                     else "bfloat16")
    mm = jnp.dtype(mm_dtype_name)
    # f32 mode must be f32 END TO END: the outside h matmul also gets the
    # multi-pass decomposition (the TPU default rounds its operands to
    # bf16 regardless of storage dtype)
    hprec = (jax.lax.Precision.HIGHEST if mm == jnp.float32 else None)

    # layout transforms (all tiny; they stay inside the autodiff graph so
    # their transposes are differentiated by XLA, outside the custom VJP)
    # t-major filter columns: h (B, n_eff, T*C), m = t*C + c
    def tmajor(w):
        return jnp.transpose(w.reshape(Cin, C, T), (0, 2, 1)).reshape(
            Cin, T * C)

    # h is CONVERTED to the matmul dtype BEFORE the (B,N,T,C)->(T,N,B,C)
    # layout pass: the kernel rounds its operands to mm anyway, and the
    # transpose is one of the largest data movements in the step (12.6 MB
    # bf16 vs 25 MB f32 per conv at the flagship config) — profiled r5:
    # ~2.3 ms/step of the 9.4 ms B=256 step was layout copies.
    if extension == "none":
        h = jnp.matmul(x.astype(jnp.float32),
                       tmajor(filters).astype(jnp.float32),
                       precision=hprec,
                       preferred_element_type=jnp.float32).astype(mm)
    else:
        w_self = filters[:Cin]
        w_nbr = filters[Cin:]
        if extension == "diff":
            wa, sign = tmajor(w_self + w_nbr), -1.0
        elif extension == "neighbor":
            wa, sign = tmajor(w_self), 1.0
        else:
            raise ValueError(f"unknown extension {extension!r}")
        xf = x.astype(jnp.float32)
        ha = jnp.matmul(xf, wa.astype(jnp.float32), precision=hprec,
                        preferred_element_type=jnp.float32)
        hb = jnp.matmul(xf, tmajor(w_nbr).astype(jnp.float32),
                        precision=hprec,
                        preferred_element_type=jnp.float32)
        h = jnp.concatenate([ha.astype(mm), (sign * hb).astype(mm)],
                            axis=1)                        # (B, 2N, TC)
    h5 = jnp.transpose(h.reshape(B, n_eff, T, C), (2, 1, 0, 3)).reshape(
        T, n_eff, B * C)
    # k-major edge rows (k*Nd + d), batch second (block-rule compliant)
    et3 = jnp.transpose(etype.astype(jnp.float32), (3, 0, 2, 1)).reshape(
        T, B, K * Nd)

    # nn_idx must be a trace-time constant (the dispatcher guarantees it)
    idx_np = np.asarray(nn_idx)
    oh_np = np.zeros((K * Nd, n_eff), np.float32)
    src_cols = idx_np.T.reshape(-1)
    if extension == "none":
        oh_np[np.arange(K * Nd), src_cols] = 1.0
    else:
        dst_cols = np.tile(np.arange(Nd), K)               # row k*Nd + d
        oh_np[np.arange(K * Nd), dst_cols] = 1.0           # self term
        oh_np[np.arange(K * Nd), N + src_cols] += 1.0      # neighbor term
    # one-hot operators ride the matmul dtype (0/1/2 are exact in bf16):
    # halves their VMEM residency and skips the in-kernel convert
    oh = jnp.asarray(oh_np.astype(mm))
    oht = jnp.asarray(oh_np.T.copy().astype(mm))

    out_dtype_name = ("bfloat16" if x.dtype == jnp.bfloat16 else "float32")
    out2 = _fused(h5, et3, oh, oht, nout, aggregator,
                  float(gamma), mm_dtype_name, Nd, K, bT, bTf,
                  out_dtype_name)  # (Nd, B*C)
    out = jnp.transpose(out2.reshape(Nd, B, C), (1, 0, 2)).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
