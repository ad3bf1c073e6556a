"""Shared training infrastructure: train state, optimizers with
reference-matching schedules, checkpointing with full resume.

Reference semantics reproduced (SURVEY.md §5):
  * torch.optim.Adam with L2 weight decay folded into the gradient
    (train_ldpc.py:160-161) — optax add_decayed_weights BEFORE adam.
  * LambdaLR stepped per EPOCH: lr = base * factor(epoch)
    (train_syn_*.py 0.98^epoch; train_ldpc.py warmup/0.99 decay).
  * grad-clip 1.0 (train_syn_fixed_pw_hop.py:270) where the reference uses it.
  * checkpoint dict {params, batch_stats, opt_state, epoch, gcnt} with
    resume-if-exists (train_ldpc.py:172-183).
"""

from __future__ import annotations

import logging
import os
import pickle
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import freeze, unfreeze


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    gcnt: jax.Array  # global step


@dataclass
class Schedules:
    """Per-epoch LR multipliers (LambdaLR equivalents)."""

    @staticmethod
    def exp_decay(gamma: float = 0.98, floor: float = 1e-6):
        return lambda epoch: max(gamma ** epoch, floor)

    @staticmethod
    def ldpc(start: int = 10):
        # train_ldpc.py:163-167
        def f(epoch):
            if epoch <= start:
                return max(1e-2, epoch / start)
            return max(0.99 ** (epoch - start), 1e-6)
        return f


def make_optimizer(base_lr: float, weight_decay: float = 0.0,
                   clip_norm: Optional[float] = None):
    """Adam with torch-style L2 decay and a settable LR (per-epoch).

    Default is PER-LEAF Adam (the plain optax chain).  The r2-r4 builds
    wrapped the transform in ``optax.flatten``, on the theory that ~400
    small parameter leaves unroll into latency-bound HLO; re-measured in
    r5 on the real chip, the flatten machinery is the SLOWER side: its
    two tree->vector concatenates plus the per-leaf DMA copies feeding
    them cost ~1.1 ms of the 9.4 ms B=256 LDPC step (profiled: 858
    f32[64]-class copy-dones/step), while the per-leaf update's small
    fusions schedule at ~0.15 ms.  Net: 9.42 -> 8.48 ms/step.
    FGNN_OPT_FLATTEN=1 restores the flattened form (needed to resume
    r2-r4 checkpoints, whose opt_state is the flat layout).
    """
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.inject_hyperparams(optax.adam)(learning_rate=base_lr))
    tx = optax.chain(*parts)
    if os.environ.get("FGNN_OPT_FLATTEN", "0") == "1":
        tx = optax.flatten(tx)
    return tx


def set_lr(opt_state, lr: float):
    """Set the injected learning rate in-place (returns new opt_state)."""
    inner = opt_state[-1]
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


# Bump when the on-disk layout changes incompatibly.  v2 containers carry
# an ``opt_layout`` tag ("flat" = optax.flatten per r2-r4 default, "tree" =
# per-leaf Adam, the r5 default); absent means "flat".  Loading requires
# the running optimizer to match — set FGNN_OPT_FLATTEN accordingly.
CKPT_FORMAT_VERSION = 2


def _opt_layout(state: TrainState) -> str:
    """'flat' (optax.flatten) vs 'tree' (per-leaf Adam).

    A flattened optimizer carries its Adam moments as 1-D vectors whose
    size equals the TOTAL parameter element count — a signature no
    per-leaf layout has (unless the model itself is a single flat
    vector, in which case the layouts coincide anyway)."""
    total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    for leaf in jax.tree.leaves(state.opt_state):
        if hasattr(leaf, "ndim") and leaf.ndim == 1 and leaf.size == total:
            return "flat"
    return "tree"


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "format_version": CKPT_FORMAT_VERSION,
        "opt_layout": _opt_layout(state),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "gcnt": int(state.gcnt),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    logging.info("saved checkpoint to %s (epoch %d)", path, epoch)


def load_checkpoint(path: str, state: TrainState):
    """Restore a checkpoint into an existing state skeleton.

    Returns (state, start_epoch, extra)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    version = payload.get("format_version")
    if version is not None and version != CKPT_FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path} has format version {version}, this build "
            f"reads version {CKPT_FORMAT_VERSION}; re-train, or restore "
            "params only by loading the pickle manually.")
    stored_layout = payload.get("opt_layout", "flat")
    current_layout = _opt_layout(state)
    if stored_layout != current_layout:
        raise ValueError(
            f"checkpoint {path} stores a {stored_layout!r}-layout "
            f"opt_state but the running optimizer is {current_layout!r}; "
            "set FGNN_OPT_FLATTEN=" + ("1" if stored_layout == "flat"
                                       else "0")
            + " to match (r2-r4 checkpoints are 'flat', r5+ default is "
            "'tree'), or restore params only from the pickle.")

    def _restore(template, saved):
        leaves_t, treedef = jax.tree.flatten(template)
        leaves_s = jax.tree.leaves(saved)
        if len(leaves_t) != len(leaves_s):
            raise ValueError(
                f"checkpoint {path} structure mismatch "
                f"({len(leaves_s)} leaves saved vs {len(leaves_t)} expected)"
                + ("" if version else " — an unversioned pre-"
                   "optax.flatten checkpoint cannot be restored into this "
                   "build; re-train or restore params only."))
        return jax.tree.unflatten(
            treedef, [jnp.asarray(s) for s in leaves_s])

    state = state.replace(
        params=_restore(state.params, payload["params"]),
        batch_stats=_restore(state.batch_stats, payload["batch_stats"]),
        opt_state=_restore(state.opt_state, payload["opt_state"]),
        gcnt=jnp.asarray(payload["gcnt"], jnp.int32),
    )
    logging.info("restored checkpoint from %s (epoch %d)", path, payload["epoch"])
    return state, payload["epoch"], payload.get("extra", {})


def prepare_mesh_training(mesh_spec: str, state: TrainState,
                          batch_size: int, devices=None):
    """Set up sharded training for a trainer's ``--mesh DPxTP`` flag.

    Builds the (data, model) mesh, places the train state (params TP-
    sharded where wide, everything else replicated), and returns a
    ``put`` callable that shards incoming batches on the data axis.
    This is THE multi-device entry path — the trainer CLIs and the
    driver's multichip dryrun both go through it.

    Returns (mesh, sharded_state, put).
    """
    from ..parallel import make_mesh, parse_mesh_spec, shard_batch, shard_state
    from ..parallel.mesh import set_spmd_mesh

    dp, tp = parse_mesh_spec(mesh_spec)
    mesh = make_mesh((dp, tp), devices=devices)
    if dp * tp > 1:
        # Register the mesh so the typed-conv dispatcher wraps the fused
        # Pallas kernel in shard_map over the data axis (the kernel has no
        # partitioning rule of its own, so bare pjit would reshard its
        # operands to replicated around every custom call).  Mesh training
        # therefore keeps the flagship kernel — the round-4 behavior of
        # pinning FGNN_FUSED=0 here is gone.
        set_spmd_mesh(mesh, "data")
    if batch_size % dp != 0:
        raise ValueError(
            f"batch size {batch_size} must divide the data axis ({dp}) "
            f"of mesh {mesh_spec!r}")
    state = shard_state(state, mesh)

    def put(batch):
        return shard_batch(batch, mesh, batch_size)

    return mesh, state, put


def global_norm(tree) -> float:
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(x))
                              for x in jax.tree.leaves(tree))))
