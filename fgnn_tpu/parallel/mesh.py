"""Device-mesh management.

The reference is single-process single-GPU (SURVEY.md §2.6); all scaling in
fgnn_tpu goes through a ``jax.sharding.Mesh`` with two logical axes:

  * ``data``  — batch (DP): each sample's factor graph is independent, so
    the batch axis shards cleanly; BatchNorm statistics become global
    automatically under jit (true SyncBatchNorm).
  * ``model`` — tensor axis (TP): the per-edge-type filter banks
    ``(C_in, C_out*T)`` shard on the output column axis; XLA inserts the
    all-gathers/reduce-scatters over ICI.

For multi-host runs call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code spans hosts (DCN between slices).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def parse_mesh_spec(spec: str) -> Tuple[int, int]:
    """Parse a trainer ``--mesh`` flag value \"DPxTP\" (e.g. \"8x1\", \"4x2\").

    ``\"auto\"`` means pure DP over all visible devices.
    """
    if spec == "auto":
        return len(jax.devices()), 1
    parts = spec.lower().split("x")
    if len(parts) != 2:
        raise ValueError(
            f"mesh spec must be DPxTP (e.g. 8x1 or 4x2), got {spec!r}")
    dp, tp = int(parts[0]), int(parts[1])
    if dp < 1 or tp < 1:
        raise ValueError(f"mesh axes must be >= 1, got {spec!r}")
    return dp, tp


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Create a 2D (data, model) mesh over the given (default: all) devices.

    shape=None picks (n_devices, 1) — pure DP, the right default for the
    reference workloads' sizes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def local_mesh(n: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """Mesh over the first n local devices with a model axis of given size."""
    devices = jax.devices()[: n or len(jax.devices())]
    dp = len(devices) // model_parallel
    return make_mesh((dp, model_parallel), devices=devices)


# --------------------------------------------------------------------------
# Active-mesh registry: the SPMD hook for single-device-oriented kernels.
#
# The fused Pallas conv (ops/fused_mp.py) is a custom call with no
# partitioning rule of its own; under a >1-device pjit XLA would reshard
# its operands to replicated around it.  Instead, the trainers register
# their mesh here and the typed-conv dispatcher wraps the kernel in
# ``jax.shard_map`` over the data axis (the kernel is embarrassingly
# parallel over the batch; the small filter banks replicate).  This is what
# lets the flagship kernel and mesh training COMPOSE instead of the
# round-4 behavior of pinning the slow XLA path for every multi-device run.
# --------------------------------------------------------------------------

_SPMD_STATE = {"mesh": None, "axis": "data"}


def set_spmd_mesh(mesh: Optional[Mesh], data_axis: str = "data") -> None:
    """Register (or clear, with None) the active training mesh.

    Called by ``prepare_mesh_training``; consulted by
    ``fgnn_tpu.ops.typed_mp`` to shard_map the fused kernel over the batch.
    """
    _SPMD_STATE["mesh"] = mesh
    _SPMD_STATE["axis"] = data_axis


def spmd_mesh():
    """(mesh, data_axis) of the registered training mesh, or (None, axis)."""
    return _SPMD_STATE["mesh"], _SPMD_STATE["axis"]
