"""Batched sum-product LDPC decoding on TPU.

A vectorized, jit-compiled re-design of the classical belief-network decoder
(behavioral spec: /root/reference/lib/data/MNC/bnd/bnd.cpp; numpy oracle:
fgnn_tpu/data/bp_ref.py).  Where the reference decodes one word at a time on
the CPU with pointer-chasing loops, this decodes a whole batch as dense
(B, M, rd) / (B, N, cd) tensor ops under ``lax.fori_loop`` — leave-one-out
products via masked cumulative products, early stopping via a per-sample
``done`` freeze (bitwise identical to stopping, since frozen messages stop
evolving).

Used for (a) fast BER baselines (the 30k-word eval grid decodes in one
call) and (b) generating the sum-product-error channel statistics during
dataset synthesis without leaving the accelerator.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP = 0.9999999999
TINY = 1e-40


class BPGraphArrays(NamedTuple):
    """Static padded index structure (device constants)."""

    row_cols: jax.Array   # (M, rd) int32, -1 padded
    row_mask: jax.Array   # (M, rd) bool
    col_rows: jax.Array   # (N, cd) int32, -1 padded
    col_mask: jax.Array   # (N, cd) bool
    col_slot: jax.Array   # (N, cd) int32
    inv_n: jax.Array      # (M, rd) int32: var of check-side slot
    inv_u: jax.Array      # (M, rd) int32: var-side slot of check-side slot
    N: int
    M: int

    @classmethod
    def from_ref(cls, g) -> "BPGraphArrays":
        """Build from a fgnn_tpu.data.bp_ref.BPGraph."""
        M, rd = g.row_cols.shape
        N, cd = g.col_rows.shape
        inv_n = np.zeros((M, rd), np.int32)
        inv_u = np.zeros((M, rd), np.int32)
        for n in range(N):
            for u in range(cd):
                if g.col_mask[n, u]:
                    m, l = g.col_rows[n, u], g.col_slot[n, u]
                    inv_n[m, l] = n
                    inv_u[m, l] = u
        return cls(
            row_cols=jnp.asarray(np.maximum(g.row_cols, 0), jnp.int32),
            row_mask=jnp.asarray(g.row_mask),
            col_rows=jnp.asarray(np.maximum(g.col_rows, 0), jnp.int32),
            col_mask=jnp.asarray(g.col_mask),
            col_slot=jnp.asarray(np.maximum(g.col_slot, 0), jnp.int32),
            inv_n=jnp.asarray(inv_n),
            inv_u=jnp.asarray(inv_u),
            N=int(N), M=int(M),
        )


def _loo_prod(vals, mask):
    """Masked leave-one-out products along the last axis."""
    v = jnp.where(mask, vals, 1.0)
    fwd = jnp.cumprod(v, axis=-1)
    # exclusive forward product
    fwd = jnp.concatenate([jnp.ones_like(v[..., :1]), fwd[..., :-1]], axis=-1)
    rev = jnp.cumprod(v[..., ::-1], axis=-1)[..., ::-1]
    bwd = jnp.concatenate([rev[..., 1:], jnp.ones_like(v[..., :1])], axis=-1)
    return fwd * bwd


@partial(jax.jit, static_argnames=("max_loops", "return_posterior"))
def bp_decode_batch(graph: BPGraphArrays, bias: jax.Array,
                    max_loops: int = 100, return_posterior: bool = False):
    """Decode a batch against the all-zero syndrome.

    bias: (B, N) float — P(bit = 1).
    Returns (x (B, N) int32 hard decisions, success (B,) bool,
    iters (B,) int32 — iteration at which each word converged, clamped to
    max_loops[, q1 (B, N) float32 soft posteriors P(bit=1) when
    ``return_posterior`` — frozen at each word's convergence point, the
    input of the ``--bp-features`` neural-decoder experiment]).
    """
    bias = bias.astype(jnp.float32)
    B = bias.shape[0]
    g = graph

    prior0 = 1.0 - bias                                 # (B, N)
    prior1 = bias
    dqc0 = (1.0 - 2.0 * bias)[:, g.row_cols]            # (B, M, rd)
    dqc0 = jnp.where(g.row_mask, dqc0, 1.0)

    def body(_, state):
        dqc, q1, done, iters = state
        # ---- check pass ----
        dpc = 0.5 * _loo_prod(dqc, g.row_mask)          # (B, M, rd)
        pc0 = 0.5 + dpc                                 # z = 0 everywhere
        pc1 = 0.5 - dpc
        # var-side view
        pc0_v = jnp.where(g.col_mask, pc0[:, g.col_rows, g.col_slot], 1.0)
        pc1_v = jnp.where(g.col_mask, pc1[:, g.col_rows, g.col_slot], 1.0)
        # ---- variable pass ----
        qt0 = prior0 * jnp.prod(pc0_v, axis=-1)
        qt1 = prior1 * jnp.prod(pc1_v, axis=-1)
        tot = qt0 + qt1
        q1_new = jnp.where(tot > TINY, qt1 / jnp.maximum(tot, TINY), q1)
        qc0 = prior0[..., None] * _loo_prod(pc0_v, g.col_mask)
        qc1 = prior1[..., None] * _loo_prod(pc1_v, g.col_mask)
        s = qc0 + qc1
        d = jnp.where(s > TINY, (qc0 - qc1) / jnp.maximum(s, TINY), 0.0)
        d = jnp.clip(d, -CLIP, CLIP)
        dqc_new = jnp.where(g.row_mask, d[:, g.inv_n, g.inv_u], 1.0)
        # freeze decoded samples
        keep = done[:, None, None]
        dqc = jnp.where(keep, dqc, dqc_new)
        q1 = jnp.where(done[:, None], q1, q1_new)
        # ---- score ----
        x = (q1 >= 0.5).astype(jnp.int32)
        syn = jnp.sum(jnp.where(g.row_mask, x[:, g.row_cols], 0), axis=-1) % 2
        ok = jnp.all(syn == 0, axis=-1)
        iters = jnp.where(done, iters, iters + 1)
        done = jnp.logical_or(done, ok)
        return dqc, q1, done, iters

    q1_init = jnp.full(bias.shape, 0.49, jnp.float32)
    state = (dqc0, q1_init, jnp.zeros(B, bool), jnp.zeros(B, jnp.int32))
    dqc, q1, done, iters = jax.lax.fori_loop(0, max_loops, body, state)
    x = (q1 >= 0.5).astype(jnp.int32)
    if return_posterior:
        return x, done, iters, q1
    return x, done, iters
